// Native host-side MP3 bitstream parser for the TPU decode framework.
//
// Covers the inherently serial layers (tag skip, frame-header sync, side
// info, bit-reservoir assembly, scalefactors, Huffman spectral decode) at
// native speed and emits fixed-shape granule-batch arrays that feed the
// batched device DSP. Semantics mirror go_mp3_tpu/bitstream/*.py, which in
// turn match the reference decoder (see file:line citations there).
//
// Exposed as a small C ABI consumed via ctypes (go_mp3_tpu/native/lib.py).
//
// Build: tools/build_native.sh  ->  libmp3parse.so

#include <cstdint>
#include <cstring>
#include <vector>

#include "huffman_data.h"

namespace gomp3 {

// ---------------------------------------------------------------------------
// Constants (ISO 11172-3; same tables as go_mp3_tpu/consts.py)
// ---------------------------------------------------------------------------

constexpr int kSamplesPerGr = 576;
constexpr int64_t kMaxSyncSearchBytes = 64 * 1024;

constexpr int kBitrates[2][16] = {
    // MPEG-1 Layer III
    {0, 32000, 40000, 48000, 56000, 64000, 80000, 96000, 112000, 128000,
     160000, 192000, 224000, 256000, 320000, 0},
    // MPEG-2 Layer III
    {0, 8000, 16000, 24000, 32000, 40000, 48000, 56000, 64000, 80000, 96000,
     112000, 128000, 144000, 160000, 0},
};

// Long/short scalefactor band boundaries [lsf][sfreq]
constexpr int kBandLong[2][3][23] = {
    {{0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134, 162,
      196, 238, 288, 342, 418, 576},
     {0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128, 156,
      190, 230, 276, 330, 384, 576},
     {0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156, 194,
      240, 296, 364, 448, 550, 576}},
    {{0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238,
      284, 336, 396, 464, 522, 576},
     {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 114, 136, 162, 194, 232,
      278, 332, 394, 464, 540, 576},
     {0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96, 116, 140, 168, 200, 238,
      284, 336, 396, 464, 522, 576}},
};

// Short scalefactor band boundaries [lsf][sfreq]
constexpr int kBandShort[2][3][14] = {
    {{0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192},
     {0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192},
     {0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192}},
    {{0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192},
     {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 136, 180, 192},
     {0, 4, 8, 12, 18, 26, 36, 48, 62, 80, 104, 134, 174, 192}},
};

// Short-block reorder permutations (frame.go:257-302): applied on host so
// the device path consumes post-reorder spectra with no TPU gather.
// kind 0 = pure short (all bands), kind 1 = mixed (bands 3+ only).
struct ReorderPerms {
  int16_t perm[2][3][2][kSamplesPerGr];
  ReorderPerms() {
    for (int lsf = 0; lsf < 2; lsf++)
      for (int sf = 0; sf < 3; sf++)
        for (int kind = 0; kind < 2; kind++) {
          int16_t* p = perm[lsf][sf][kind];
          for (int l = 0; l < kSamplesPerGr; l++) p[l] = int16_t(l);
          int first = kind == 1 ? 3 : 0;
          const int* bands = kBandShort[lsf][sf];
          for (int sfb = first; sfb < 13; sfb++) {
            int start3 = 3 * bands[sfb];
            int wl = bands[sfb + 1] - bands[sfb];
            for (int win = 0; win < 3; win++)
              for (int j = 0; j < wl; j++)
                p[start3 + j * 3 + win] = int16_t(start3 + win * wl + j);
          }
        }
  }
};
static const ReorderPerms kReorder;

constexpr int kScalefacSizesMpeg1[16][2] = {
    {0, 0}, {0, 1}, {0, 2}, {0, 3}, {3, 0}, {1, 1}, {1, 2}, {1, 3},
    {2, 1}, {2, 2}, {2, 3}, {3, 1}, {3, 2}, {3, 3}, {4, 2}, {4, 3}};

constexpr int kScalefacSizesMpeg2[3][6][4] = {
    {{6, 5, 5, 5}, {6, 5, 7, 3}, {11, 10, 0, 0},
     {7, 7, 7, 0}, {6, 6, 6, 3}, {8, 8, 5, 0}},
    {{9, 9, 9, 9}, {9, 9, 12, 6}, {18, 18, 0, 0},
     {12, 12, 12, 0}, {12, 9, 9, 6}, {15, 12, 9, 0}},
    {{6, 9, 9, 9}, {6, 9, 12, 6}, {15, 18, 0, 0},
     {6, 15, 12, 0}, {6, 12, 9, 6}, {6, 18, 9, 0}}};

// MPEG-2 packed slen table (mirrors maindata.py N_SLEN2)
struct NSlen2 {
  int v[512];
  constexpr NSlen2() : v() {
    for (int i = 0; i < 4; i++)
      for (int j = 0; j < 3; j++)
        v[j + i * 3 + 500] = i | (j << 3) | (2 << 12) | (1 << 15);
    for (int i = 0; i < 5; i++)
      for (int j = 0; j < 5; j++)
        for (int k = 0; k < 4; k++)
          for (int l = 0; l < 4; l++)
            v[l + k * 4 + j * 16 + i * 80] = i | (j << 3) | (k << 6) | (l << 9);
    for (int i = 0; i < 5; i++)
      for (int j = 0; j < 5; j++)
        for (int k = 0; k < 4; k++)
          v[k + j * 4 + i * 20 + 400] = i | (j << 3) | (k << 6) | (1 << 12);
  }
};
constexpr NSlen2 kNSlen2;

// ---------------------------------------------------------------------------
// Huffman peek-LUTs (built once from the canonical codebooks)
// ---------------------------------------------------------------------------

struct HuffLut {
  int maxlen = 0;
  std::vector<uint32_t> lut;  // entry = len<<8 | x<<4 | y
};

struct HuffLuts {
  HuffLut by_table[34];
  HuffLuts() {
    // distinct books share built LUTs
    for (int t = 0; t < 34; t++) {
      const TableRef& ref = kTables[t];
      if (!ref.book) continue;
      // check if an earlier table used the same book
      int prev = -1;
      for (int u = 0; u < t; u++)
        if (kTables[u].book == ref.book) { prev = u; break; }
      if (prev >= 0) { by_table[t] = by_table[prev]; continue; }
      int maxlen = 0;
      for (int i = 0; i < ref.size; i++)
        if (ref.book[i].len > maxlen) maxlen = ref.book[i].len;
      HuffLut& h = by_table[t];
      h.maxlen = maxlen;
      h.lut.assign(size_t(1) << maxlen, 0);
      for (int i = 0; i < ref.size; i++) {
        const HuffEntry& e = ref.book[i];
        uint32_t val = (uint32_t(e.len) << 8) | (uint32_t(e.x) << 4) | e.y;
        size_t lo = size_t(e.code) << (maxlen - e.len);
        size_t hi = size_t(e.code + 1) << (maxlen - e.len);
        for (size_t w = lo; w < hi; w++) h.lut[w] = val;
      }
    }
  }
};

static const HuffLuts& huff_luts() {
  static HuffLuts luts;
  return luts;
}

// ---------------------------------------------------------------------------
// Bit reader (semantics of bitstream/bits.py: sticky error, non-advancing
// reads past the end)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* vec = nullptr;
  int64_t nbytes = 0;
  int64_t pos = 0;  // in bits
  bool err = false;

  int64_t total_bits() const { return nbytes << 3; }

  int bit() {
    if ((pos >> 3) >= nbytes) { err = true; return 0; }
    int b = (vec[pos >> 3] >> (7 - (pos & 7))) & 1;
    pos++;
    return b;
  }

  static uint64_t be64(const uint8_t* p) {
    uint64_t w;
    memcpy(&w, p, 8);
    return __builtin_bswap64(w);
  }

  uint32_t bits(int num) {
    if (num == 0) return 0;
    if (pos + num > total_bits()) { err = true; return 0; }
    int64_t bp = pos >> 3;
    if (bp + 8 <= nbytes) {  // fast path: unaligned 64-bit window
      uint64_t w = be64(vec + bp) << (pos & 7);
      pos += num;
      return uint32_t(w >> (64 - num));
    }
    uint32_t tmp = 0;
    for (int i = 0; i < 4; i++)
      tmp = (tmp << 8) | (bp + i < nbytes ? vec[bp + i] : 0);
    tmp <<= (pos & 7);
    uint32_t out = tmp >> (32 - num);
    pos += num;
    return out;
  }

  uint32_t peek_padded(int num) const {
    int64_t bp = pos >> 3;
    if (bp + 8 <= nbytes) {  // fast path (num <= 19 + 7 offset < 64)
      uint64_t w = be64(vec + bp) << (pos & 7);
      return uint32_t(w >> (64 - num));
    }
    uint64_t tmp = 0;
    for (int i = 0; i < 5; i++)
      tmp = (tmp << 8) | (bp + i < nbytes ? vec[bp + i] : 0);
    tmp <<= (pos & 7);
    tmp &= 0xFFFFFFFFFFull;  // keep 40 bits
    return uint32_t(tmp >> (40 - num));
  }
};

// Decode one codeword (mirrors bitstream/huffman.py decode()).
static inline void huff_decode(BitReader& m, int table_num, int* x, int* y,
                               int* v, int* w) {
  *x = *y = *v = *w = 0;
  const HuffLut& h = huff_luts().by_table[table_num];
  if (h.maxlen == 0) return;
  uint32_t window = m.peek_padded(h.maxlen);
  uint32_t packed = h.lut[window];
  int length = int(packed >> 8);
  int64_t remaining = m.total_bits() - m.pos;
  if (length > remaining) {
    m.pos = m.total_bits();
    m.err = true;
  } else {
    m.pos += length;
  }
  int xx = int((packed >> 4) & 0xF);
  int yy = int(packed & 0xF);

  if (table_num > 31) {
    int vv = (yy >> 3) & 1, ww = (yy >> 2) & 1;
    xx = (yy >> 1) & 1;
    yy &= 1;
    if (vv && m.bit() == 1) vv = -vv;
    if (ww && m.bit() == 1) ww = -ww;
    if (xx && m.bit() == 1) xx = -xx;
    if (yy && m.bit() == 1) yy = -yy;
    *v = vv; *w = ww; *x = xx; *y = yy;
    return;
  }
  int linbits = kTables[table_num].linbits;
  if (linbits && xx == 15) xx += int(m.bits(linbits));
  if (xx && m.bit() == 1) xx = -xx;
  if (linbits && yy == 15) yy += int(m.bits(linbits));
  if (yy && m.bit() == 1) yy = -yy;
  *x = xx; *y = yy;
}

// ---------------------------------------------------------------------------
// Frame header
// ---------------------------------------------------------------------------

struct Header {
  uint32_t word = 0;
  int version() const { return int((word >> 19) & 3); }
  int layer() const { return int((word >> 17) & 3); }
  int protection_bit() const { return int((word >> 16) & 1); }
  int bitrate_index() const { return int((word >> 12) & 0xF); }
  int sfreq() const { return int((word >> 10) & 3); }
  int padding() const { return int((word >> 9) & 1); }
  int mode() const { return int((word >> 6) & 3); }
  int mode_ext() const { return int((word >> 4) & 3); }
  int emphasis() const { return int(word & 3); }
  int lsf() const { return version() == 3 ? 0 : 1; }
  bool mono() const { return mode() == 3; }
  int nch() const { return mono() ? 1 : 2; }
  int granules() const { return 2 >> lsf(); }
  bool ms_stereo() const { return mode() == 1 && (mode_ext() & 2); }
  bool is_stereo() const { return mode() == 1 && (mode_ext() & 1); }
  int sample_rate() const {
    static const int base[3] = {44100, 48000, 32000};
    return base[sfreq()] >> lsf();
  }
  int bitrate() const { return kBitrates[lsf()][bitrate_index()]; }
  int frame_size() const {
    return ((144 * bitrate()) / sample_rate() + padding()) >> lsf();
  }
  int side_info_size() const {
    if (lsf() == 1) return mono() ? 9 : 17;
    return mono() ? 17 : 32;
  }
  bool is_valid() const {
    if ((word & 0xFFE00000u) != 0xFFE00000u) return false;
    if (version() == 1) return false;      // reserved
    if (bitrate_index() == 15) return false;
    if (sfreq() == 3) return false;        // reserved
    if (layer() != 1) return false;        // Layer III only
    if (emphasis() == 2) return false;
    return true;
  }
};

// ---------------------------------------------------------------------------
// Side info
// ---------------------------------------------------------------------------

struct SideInfo {
  int main_data_begin = 0;
  int scfsi[2][4] = {};
  int part2_3_length[2][2] = {};
  int big_values[2][2] = {};
  int global_gain[2][2] = {};
  int scalefac_compress[2][2] = {};
  int win_switch[2][2] = {};
  int block_type[2][2] = {};
  int mixed_flag[2][2] = {};
  int table_select[2][2][3] = {};
  int subblock_gain[2][2][3] = {};
  int region0[2][2] = {};
  int region1[2][2] = {};
  int preflag[2][2] = {};
  int sf_scale[2][2] = {};
  int count1_table[2][2] = {};
  int count1[2][2] = {};
};

// ---------------------------------------------------------------------------
// Parser
// ---------------------------------------------------------------------------

enum Status {
  OK = 0,
  END_OF_AUDIO = 1,   // clean EOF / trailing junk / sync limit
  HARD_ERROR = 2,     // malformed stream (framesize caps, MPEG-2.5, ...)
};

struct Parser {
  const uint8_t* data;
  int64_t len;
  int64_t pos = 0;

  std::vector<uint8_t> reservoir;       // previous assembled main-data buf
  std::vector<uint8_t> scratch;         // reused assembly buffer
  bool has_prev = false;
  int sample_rate = 0;
  const char* error = "";

  Parser(const uint8_t* d, int64_t n) : data(d), len(n) { skip_tags(); }

  // --- byte-level helpers -------------------------------------------------
  int64_t remaining() const { return len - pos; }

  void skip_tags() {
    for (;;) {
      if (remaining() < 3) return;
      if (memcmp(data + pos, "TAG", 3) == 0) {
        if (remaining() < 128) { pos = len; return; }
        pos += 128;
      } else if (memcmp(data + pos, "ID3", 3) == 0) {
        if (remaining() < 10) { pos = len; return; }
        // Syncsafe size; like the Python/reference path, the top bits are
        // not masked (a well-formed tag keeps every byte < 0x80).
        uint32_t size = (uint32_t(data[pos + 6]) << 21) |
                        (uint32_t(data[pos + 7]) << 14) |
                        (uint32_t(data[pos + 8]) << 7) |
                        uint32_t(data[pos + 9]);
        if (remaining() < int64_t(10) + size) { pos = len; return; }
        pos += 10 + size;
      } else {
        return;
      }
    }
  }

  Status read_header(Header* h) {
    if (remaining() == 0) return END_OF_AUDIO;
    if (remaining() < 4) return END_OF_AUDIO;  // UnexpectedEOF -> end
    uint32_t word = (uint32_t(data[pos]) << 24) | (uint32_t(data[pos + 1]) << 16) |
                    (uint32_t(data[pos + 2]) << 8) | uint32_t(data[pos + 3]);
    int64_t searched = 4;
    int64_t p = pos + 4;
    Header hh{word};
    while (!hh.is_valid()) {
      if (searched >= kMaxSyncSearchBytes) return END_OF_AUDIO;  // sync limit
      if (p >= len) return END_OF_AUDIO;                         // UnexpectedEOF
      word = (word << 8) | data[p];
      hh.word = word;
      p++; searched++;
    }
    if (hh.bitrate_index() == 0) { error = "free bitrate"; return HARD_ERROR; }
    pos = p;
    *h = hh;
    return OK;
  }

  Status read_side_info(const Header& h, SideInfo* si) {
    if (h.frame_size() > 2000) { error = "framesize"; return HARD_ERROR; }
    int size = h.side_info_size();
    if (remaining() < size) return END_OF_AUDIO;
    BitReader s{data + pos, size};
    pos += size;

    int lsf = h.lsf();
    int nch = h.nch();
    static const int btr[2][4] = {{9, 5, 3, 4}, {8, 1, 2, 9}};
    si->main_data_begin = int(s.bits(btr[lsf][0]));
    s.bits(h.mono() ? btr[lsf][1] : btr[lsf][2]);  // private bits
    if (lsf == 0)
      for (int ch = 0; ch < nch; ch++)
        for (int b = 0; b < 4; b++) si->scfsi[ch][b] = s.bit();
    for (int gr = 0; gr < h.granules(); gr++) {
      for (int ch = 0; ch < nch; ch++) {
        si->part2_3_length[gr][ch] = int(s.bits(12));
        si->big_values[gr][ch] = int(s.bits(9));
        si->global_gain[gr][ch] = int(s.bits(8));
        si->scalefac_compress[gr][ch] = int(s.bits(btr[lsf][3]));
        si->win_switch[gr][ch] = s.bit();
        if (si->win_switch[gr][ch] == 1) {
          si->block_type[gr][ch] = int(s.bits(2));
          si->mixed_flag[gr][ch] = s.bit();
          for (int r = 0; r < 2; r++) si->table_select[gr][ch][r] = int(s.bits(5));
          for (int w = 0; w < 3; w++) si->subblock_gain[gr][ch][w] = int(s.bits(3));
          si->region0[gr][ch] =
              (si->block_type[gr][ch] == 2 && si->mixed_flag[gr][ch] == 0) ? 8 : 7;
          si->region1[gr][ch] = 20 - si->region0[gr][ch];
        } else {
          for (int r = 0; r < 3; r++) si->table_select[gr][ch][r] = int(s.bits(5));
          si->region0[gr][ch] = int(s.bits(4));
          si->region1[gr][ch] = int(s.bits(3));
          si->block_type[gr][ch] = 0;
          si->mixed_flag[gr][ch] = 0;
        }
        if (lsf == 0) si->preflag[gr][ch] = s.bit();
        si->sf_scale[gr][ch] = s.bit();
        si->count1_table[gr][ch] = s.bit();
      }
    }
    return OK;
  }

  // Huffman spectral decode for one granule/channel
  // (mirrors bitstream/maindata.py _read_huffman)
  Status read_huffman(BitReader& m, const Header& h, SideInfo* si, int gr,
                      int ch, int64_t part2_start, int16_t* is_out) {
    if (si->part2_3_length[gr][ch] == 0) {
      memset(is_out, 0, kSamplesPerGr * sizeof(int16_t));
      si->count1[gr][ch] = 0;
      return OK;
    }
    int64_t bit_pos_end = part2_start + si->part2_3_length[gr][ch] - 1;
    int region1_start, region2_start;
    if (si->win_switch[gr][ch] == 1 && si->block_type[gr][ch] == 2) {
      region1_start = 36;
      region2_start = kSamplesPerGr;
    } else {
      const int* bands = kBandLong[h.lsf()][h.sfreq()];
      int i = si->region0[gr][ch] + 1;
      if (i < 0 || i >= 23) { error = "region index"; return HARD_ERROR; }
      region1_start = bands[i];
      int j = si->region0[gr][ch] + si->region1[gr][ch] + 2;
      region2_start = (j >= 23) ? kSamplesPerGr : bands[j];
    }
    int big2 = si->big_values[gr][ch] * 2;
    if (big2 > kSamplesPerGr) { error = "is_pos too big"; return HARD_ERROR; }
    int is_pos = 0;
    int x, y, v, w;
    while (is_pos < big2) {
      int table = si->table_select[gr][ch][is_pos < region1_start     ? 0
                                           : is_pos < region2_start ? 1
                                                                    : 2];
      huff_decode(m, table, &x, &y, &v, &w);
      is_out[is_pos++] = int16_t(x);
      is_out[is_pos++] = int16_t(y);
    }
    int table = si->count1_table[gr][ch] + 32;
    while (is_pos <= 572 && m.pos <= bit_pos_end) {
      huff_decode(m, table, &x, &y, &v, &w);
      is_out[is_pos++] = int16_t(v);
      if (is_pos >= kSamplesPerGr) break;
      is_out[is_pos++] = int16_t(w);
      if (is_pos >= kSamplesPerGr) break;
      is_out[is_pos++] = int16_t(x);
      if (is_pos >= kSamplesPerGr) break;
      is_out[is_pos++] = int16_t(y);
    }
    if (m.pos > bit_pos_end + 1) is_pos -= 4;
    if (is_pos < 0) is_pos = 0;
    si->count1[gr][ch] = is_pos;
    if (is_pos < kSamplesPerGr)
      memset(is_out + is_pos, 0, (kSamplesPerGr - is_pos) * sizeof(int16_t));
    m.pos = bit_pos_end + 1;
    m.err = false;
    return OK;
  }

  // Scalefactor + spectral decode (MPEG-1), writing straight into the
  // output arrays for granule records g0/g0+1.
  Status scalefactors_mpeg1(BitReader& m, const Header& h, SideInfo* si,
                            int32_t* sfl, int32_t* sfs, int16_t* spectra) {
    int nch = h.nch();
    // sfl layout per granule record: [2][22]; sfs: [2][13*3]
    for (int gr = 0; gr < 2; gr++) {
      int32_t* sfl_g = sfl + gr * 2 * 22;
      int32_t* sfs_g = sfs + gr * 2 * 39;
      for (int ch = 0; ch < nch; ch++) {
        int64_t part2_start = m.pos;
        int slen1 = kScalefacSizesMpeg1[si->scalefac_compress[gr][ch]][0];
        int slen2 = kScalefacSizesMpeg1[si->scalefac_compress[gr][ch]][1];
        if (si->win_switch[gr][ch] == 1 && si->block_type[gr][ch] == 2) {
          if (si->mixed_flag[gr][ch]) {
            for (int sfb = 0; sfb < 8; sfb++)
              sfl_g[ch * 22 + sfb] = int(m.bits(slen1));
            for (int sfb = 3; sfb < 12; sfb++) {
              int nbits = sfb < 6 ? slen1 : slen2;
              for (int win = 0; win < 3; win++)
                sfs_g[ch * 39 + sfb * 3 + win] = int(m.bits(nbits));
            }
          } else {
            for (int sfb = 0; sfb < 12; sfb++) {
              int nbits = sfb < 6 ? slen1 : slen2;
              for (int win = 0; win < 3; win++)
                sfs_g[ch * 39 + sfb * 3 + win] = int(m.bits(nbits));
            }
          }
        } else {
          static const int lo[4] = {0, 6, 11, 16};
          static const int hi[4] = {6, 11, 16, 21};
          const int slen[4] = {slen1, slen1, slen2, slen2};
          int32_t* sfl_g0 = sfl + 0 * 2 * 22;  // granule 0 record
          for (int band = 0; band < 4; band++) {
            if (si->scfsi[ch][band] == 0 || gr == 0) {
              for (int sfb = lo[band]; sfb < hi[band]; sfb++)
                sfl_g[ch * 22 + sfb] = int(m.bits(slen[band]));
            } else if (si->scfsi[ch][band] == 1 && gr == 1) {
              for (int sfb = lo[band]; sfb < hi[band]; sfb++)
                sfl_g[ch * 22 + sfb] = sfl_g0[ch * 22 + sfb];
            }
          }
        }
        Status st = read_huffman(m, h, si, gr, ch, part2_start,
                                 spectra + (gr * 2 + ch) * kSamplesPerGr);
        if (st != OK) return st;
      }
    }
    return OK;
  }

  Status scalefactors_mpeg2(BitReader& m, const Header& h, SideInfo* si,
                            int32_t* sfl, int32_t* sfs, int16_t* spectra) {
    int nch = h.nch();
    for (int ch = 0; ch < nch; ch++) {
      int64_t part2_start = m.pos;
      int slen = kNSlen2.v[si->scalefac_compress[0][ch]];
      si->preflag[0][ch] = (slen >> 15) & 1;
      int n = 0;
      if (si->block_type[0][ch] == 2) {
        n++;
        if (si->mixed_flag[0][ch]) n++;
      }
      int d = (slen >> 12) & 7;
      int sf[40];
      int cnt = 0;
      for (int i = 0; i < 4; i++) {
        int num = slen & 7;
        slen >>= 3;
        int c = kScalefacSizesMpeg2[n][d][i];
        if (num > 0)
          for (int k = 0; k < c; k++) sf[cnt++] = int(m.bits(num));
        else
          for (int k = 0; k < c; k++) sf[cnt++] = 0;
      }
      int pad = (n << 1) + 1;
      for (int k = 0; k < pad; k++) sf[cnt++] = 0;

      if (cnt == 22) {
        for (int i = 0; i < 22; i++) sfl[ch * 22 + i] = sf[i];
      } else {
        for (int i = 0; i < 39; i++) sfs[ch * 39 + i] = sf[i];
      }
      Status st = read_huffman(m, h, si, 0, ch, part2_start,
                               spectra + ch * kSamplesPerGr);
      if (st != OK) return st;
    }
    return OK;
  }

  // Parse one frame; on success append its granules to the output arrays.
  // Writes at offsets g (granule index) into caller arrays.
  Status parse_frame(int16_t* spectra, int32_t* sfl, int32_t* sfs,
                     int32_t* meta, int* granules_out, int64_t* frame_pos) {
    Header h;
    Status st = read_header(&h);
    if (st != OK) return st;
    *frame_pos = pos - 4;
    if (h.protection_bit() == 0) {
      if (remaining() < 2) return END_OF_AUDIO;
      pos += 2;  // CRC value ignored
    }
    if (h.version() == 0) { error = "MPEG-2.5 not supported"; return HARD_ERROR; }
    // layer check already in is_valid()

    SideInfo si;
    st = read_side_info(h, &si);
    if (st != OK) return st;

    // ---- bit reservoir assembly (mirrors maindata.py) ----
    int frame_size = h.frame_size();
    int main_size = frame_size - h.side_info_size() - 4;
    if (h.protection_bit() == 0) main_size -= 2;
    if (main_size > 1500) { error = "main size"; return HARD_ERROR; }
    if (main_size < 0) { error = "negative main size"; return HARD_ERROR; }
    if (remaining() < main_size) return END_OF_AUDIO;

    std::vector<uint8_t>& assembled = scratch;
    assembled.clear();
    int offset = si.main_data_begin;
    if (has_prev && offset > int(reservoir.size())) {
      // underfilled reservoir: decode anyway from full prev + new bytes
      assembled.insert(assembled.end(), reservoir.begin(), reservoir.end());
    } else {
      if (has_prev && offset > 0)
        assembled.insert(assembled.end(), reservoir.end() - offset,
                         reservoir.end());
    }
    assembled.insert(assembled.end(), data + pos, data + pos + main_size);
    pos += main_size;

    BitReader m{assembled.data(), int64_t(assembled.size())};

    int ngr = h.granules();
    // zero granule records (mono ch1, unset scalefacs)
    memset(spectra, 0, ngr * 2 * kSamplesPerGr * sizeof(int16_t));
    memset(sfl, 0, ngr * 2 * 22 * sizeof(int32_t));
    memset(sfs, 0, ngr * 2 * 39 * sizeof(int32_t));

    if (h.lsf() == 1)
      st = scalefactors_mpeg2(m, h, &si, sfl, sfs, spectra);
    else
      st = scalefactors_mpeg1(m, h, &si, sfl, sfs, spectra);
    if (st != OK) return st;

    // host-side short-block reorder (device consumes post-reorder layout)
    for (int gr = 0; gr < ngr; gr++) {
      for (int ch = 0; ch < h.nch(); ch++) {
        if (!(si.win_switch[gr][ch] == 1 && si.block_type[gr][ch] == 2))
          continue;
        int kind = si.mixed_flag[gr][ch] ? 1 : 0;
        const int16_t* p = kReorder.perm[h.lsf()][h.sfreq()][kind];
        int16_t* s = spectra + (gr * 2 + ch) * kSamplesPerGr;
        int16_t tmp[kSamplesPerGr];
        for (int l = 0; l < kSamplesPerGr; l++) tmp[l] = s[p[l]];
        memcpy(s, tmp, sizeof(tmp));
      }
    }

    // keep the full assembled buffer as the next frame's reservoir source
    reservoir.swap(assembled);  // scratch now holds the old reservoir
    has_prev = true;
    if (sample_rate == 0) sample_rate = h.sample_rate();

    // ---- emit per-granule meta ----
    int variant = h.lsf() * 3 + h.sfreq();
    for (int gr = 0; gr < ngr; gr++) {
      int32_t* mg = meta + gr * 24;
      mg[0] = variant;
      mg[1] = (h.ms_stereo() ? 1 : 0) | (h.is_stereo() ? 2 : 0) |
              (h.mono() ? 4 : 0);
      mg[2] = h.mono() ? si.count1[gr][0] : si.count1[gr][1];
      mg[3] = 0;  // frame index filled by caller if wanted
      for (int ch = 0; ch < 2; ch++) {
        int c = h.mono() ? 0 : ch;  // mono: duplicate is NOT done; ch1 zeros
        bool real = ch < h.nch();
        mg[4 + ch] = real ? si.global_gain[gr][c] : 0;
        mg[6 + ch] = real ? si.sf_scale[gr][c] : 0;
        mg[8 + ch] = real ? si.preflag[gr][c] : 0;
        mg[10 + ch] = real ? si.block_type[gr][c] : 0;
        int cls = 0;
        if (real && si.win_switch[gr][c] == 1 && si.block_type[gr][c] == 2)
          cls = si.mixed_flag[gr][c] ? 2 : 1;
        mg[12 + ch] = cls;
        for (int w = 0; w < 3; w++)
          mg[14 + ch * 3 + w] = real ? si.subblock_gain[gr][c][w] : 0;
        mg[20 + ch] = real ? si.count1[gr][c] : 0;
      }
      mg[22] = gr;
      mg[23] = 0;
    }
    *granules_out = ngr;
    return OK;
  }
};

}  // namespace gomp3

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

using gomp3::Parser;

void* gmp_create(const uint8_t* data, int64_t len) {
  return new Parser(data, len);
}

void gmp_destroy(void* p) { delete static_cast<Parser*>(p); }

int gmp_sample_rate(void* p) { return static_cast<Parser*>(p)->sample_rate; }

const char* gmp_error(void* p) { return static_cast<Parser*>(p)->error; }

// Checkpoint/resume support: byte position within the creation buffer and
// the bit-reservoir contents (the previous frame's assembled main-data
// buffer; its tail feeds the next frame's main_data_begin backreference).
int64_t gmp_pos(void* pv) { return static_cast<Parser*>(pv)->pos; }

int gmp_get_reservoir(void* pv, uint8_t* out, int cap) {
  Parser* p = static_cast<Parser*>(pv);
  if (!p->has_prev) return 0;
  int n = int(p->reservoir.size());
  if (n > cap) n = cap;
  // keep the TAIL (only the last <=511 bytes are ever referenced)
  memcpy(out, p->reservoir.data() + (p->reservoir.size() - n), n);
  return n;
}

void gmp_set_reservoir(void* pv, const uint8_t* data, int len) {
  Parser* p = static_cast<Parser*>(pv);
  p->reservoir.assign(data, data + len);
  p->has_prev = len > 0;
}

// Parse up to `cap` granules into the caller-provided arrays:
//   spectra [cap][2][576] i32, sfl [cap][2][22] i32, sfs [cap][2][39] i32,
//   meta [cap][24] i32.
// Returns granules produced (0 = end of audio), or -1 on hard error.
int gmp_parse(void* pv, int cap, int16_t* spectra, int32_t* sfl, int32_t* sfs,
              int32_t* meta) {
  Parser* p = static_cast<Parser*>(pv);
  int g = 0;
  // a frame yields up to 2 granules, so keep 2 slots free
  while (cap - g >= 2) {
    int produced = 0;
    int64_t fpos = 0;
    gomp3::Status st = p->parse_frame(
        spectra + g * 2 * 576, sfl + g * 2 * 22, sfs + g * 2 * 39,
        meta + g * 24, &produced, &fpos);
    if (st == gomp3::END_OF_AUDIO) break;
    if (st == gomp3::HARD_ERROR) return g > 0 ? g : -1;
    g += produced;
  }
  return g;
}

// Whole-file header-only index scan (mirrors decoder.py
// _ensure_frame_starts_and_length). Fills starts[cap]; returns frame count
// (may exceed cap — call again with a bigger buffer), and outputs
// bytes_per_frame and sample_rate of the stream.
int64_t gmp_index(const uint8_t* data, int64_t len, int64_t* starts,
                  int64_t cap, int32_t* bytes_per_frame,
                  int32_t* sample_rate) {
  Parser p(data, len);
  int64_t count = 0;
  *bytes_per_frame = 0;
  *sample_rate = 0;
  for (;;) {
    gomp3::Header h;
    gomp3::Status st = p.read_header(&h);
    if (st != gomp3::OK) break;
    if (starts && count < cap) starts[count] = p.pos - 4;
    count++;
    *bytes_per_frame = 576 * h.granules() * 4;
    if (*sample_rate == 0) *sample_rate = h.sample_rate();
    int64_t skip = h.frame_size() - 4;
    if (skip < 0) break;
    p.pos += skip;
    if (p.pos > p.len) break;
  }
  return count;
}

}  // extern "C"
