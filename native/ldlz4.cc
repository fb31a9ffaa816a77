// LZ4 frame + block decompression (decode only), implemented from the
// public LZ4 specs (lz4_Frame_format.md v1.6.x, lz4_Block_format.md).
//
// Why it exists: the reference distributes its text DBs as LMDBs whose
// values are lz4.frame-compressed msgpack records
// (uniter_model/data/data.py:16,160-174).  The `lz4` python package is not
// part of this image, so the ingestion path (cli/prepro from-lmdb) carries
// its own decoder.  Decode is all the converter needs — the repo's own
// stores (ldkv) never re-compress.
//
// C ABI (ctypes-friendly, no exceptions across the boundary):
//   ldlz4_content_size(src, n)        -> declared content size, -1 if the
//                                        frame does not store one, <-1 error
//   ldlz4_decompress(src, n, dst, cap, verify)
//                                     -> bytes written, or negative error
//   ldlz4_block_decompress(src, n, dst, cap, hist)
//                                     -> bytes written, or negative error
//   ldlz4_xxh32(src, n, seed)         -> xxHash32 (header/content checksums)
//
// Error codes: -2 bad magic, -3 truncated input, -4 dst too small,
// -5 corrupt stream, -6 checksum mismatch, -7 unsupported feature.

#include <cstdint>
#include <cstring>

namespace {

// ---------------------------------------------------------------------------
// xxHash32 (public spec; needed for the frame's header/block/content
// checksums — NOT a copy of the reference, which has no hash code at all)
// ---------------------------------------------------------------------------

constexpr uint32_t P1 = 2654435761u, P2 = 2246822519u, P3 = 3266489917u,
                   P4 = 668265263u, P5 = 374761393u;

inline uint32_t rotl(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/arm64), same as the rest of
             // the native tree
}

inline uint16_t rd16(const uint8_t* p) {
  uint16_t v;
  std::memcpy(&v, p, 2);
  return v;
}

inline uint64_t rd64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

uint32_t xxh32(const uint8_t* p, size_t len, uint32_t seed) {
  const uint8_t* end = p + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed,
             v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl(v1 + rd32(p) * P2, 13) * P1;
      v2 = rotl(v2 + rd32(p + 4) * P2, 13) * P1;
      v3 = rotl(v3 + rd32(p + 8) * P2, 13) * P1;
      v4 = rotl(v4 + rd32(p + 12) * P2, 13) * P1;
      p += 16;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl(h + rd32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl(h + (*p) * P5, 11) * P1;
    ++p;
  }
  h ^= h >> 15;
  h *= P2;
  h ^= h >> 13;
  h *= P3;
  h ^= h >> 16;
  return h;
}

// ---------------------------------------------------------------------------
// LZ4 block decode.  `hist` bytes immediately BEFORE dst are valid match
// history (linked-block frames let matches reach up to 64 KB into the
// previously decoded blocks).
// ---------------------------------------------------------------------------

int64_t block_decode(const uint8_t* src, int64_t n, uint8_t* dst,
                     int64_t cap, int64_t hist) {
  const uint8_t* sp = src;
  const uint8_t* send = src + n;
  uint8_t* dp = dst;
  uint8_t* dend = dst + cap;
  while (sp < send) {
    uint32_t token = *sp++;
    // literal length
    int64_t ll = token >> 4;
    if (ll == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -3;
        b = *sp++;
        ll += b;
      } while (b == 255);
    }
    if (sp + ll > send) return -3;
    if (dp + ll > dend) return -4;
    std::memcpy(dp, sp, ll);
    sp += ll;
    dp += ll;
    if (sp == send) break;  // last sequence is literals-only
    // match
    if (sp + 2 > send) return -3;
    int64_t offset = rd16(sp);
    sp += 2;
    if (offset == 0) return -5;
    if (offset > (dp - dst) + hist) return -5;
    int64_t ml = (token & 15) + 4;
    if ((token & 15) == 15) {
      uint8_t b;
      do {
        if (sp >= send) return -3;
        b = *sp++;
        ml += b;
      } while (b == 255);
    }
    if (dp + ml > dend) return -4;
    const uint8_t* mp = dp - offset;
    // byte-wise: matches may overlap their own output (offset < ml)
    for (int64_t i = 0; i < ml; ++i) dp[i] = mp[i];
    dp += ml;
  }
  return dp - dst;
}

constexpr uint32_t MAGIC = 0x184D2204u;
constexpr uint32_t MAGIC_SKIP_LO = 0x184D2A50u, MAGIC_SKIP_HI = 0x184D2A5Fu;

struct Header {
  int64_t hdr_len;       // bytes consumed (magic included)
  int64_t content_size;  // -1 if absent
  bool block_checksum;
  bool content_checksum;
  bool block_indep;
};

// returns 0 ok, negative error
int parse_header(const uint8_t* src, int64_t n, Header* h) {
  if (n < 7) return -3;
  if (rd32(src) != MAGIC) return -2;
  const uint8_t* d = src + 4;  // descriptor start
  uint8_t flg = d[0], bd = d[1];
  if ((flg >> 6) != 1) return -7;      // version must be 01
  if (flg & 0x02) return -7;           // reserved bit
  int bmax = (bd >> 4) & 7;
  if (bmax < 4 || bmax > 7 || (bd & 0x8F)) return -7;
  h->block_indep = flg & 0x20;
  h->block_checksum = flg & 0x10;
  h->content_checksum = flg & 0x04;
  bool has_size = flg & 0x08, has_dict = flg & 0x01;
  int64_t desc_len = 2 + (has_size ? 8 : 0) + (has_dict ? 4 : 0);
  if (4 + desc_len + 1 > n) return -3;
  h->content_size = has_size ? (int64_t)rd64(d + 2) : -1;
  if (has_dict) return -7;  // dictionaries unused by lz4.frame defaults
  uint8_t hc = d[desc_len];
  if (((xxh32(d, desc_len, 0) >> 8) & 0xFF) != hc) return -6;
  h->hdr_len = 4 + desc_len + 1;
  return 0;
}

}  // namespace

extern "C" {

uint32_t ldlz4_xxh32(const uint8_t* src, int64_t n, uint32_t seed) {
  return xxh32(src, n, seed);
}

int64_t ldlz4_block_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                               int64_t cap, int64_t hist) {
  if (!src || !dst || n < 0 || cap < 0) return -5;
  return block_decode(src, n, dst, cap, hist < 0 ? 0 : hist);
}

int64_t ldlz4_content_size(const uint8_t* src, int64_t n) {
  const uint8_t* p = src;
  const uint8_t* end = src + n;
  // skip any leading skippable frames
  while (end - p >= 8) {
    uint32_t magic = rd32(p);
    if (magic >= MAGIC_SKIP_LO && magic <= MAGIC_SKIP_HI) {
      int64_t sz = rd32(p + 4);
      if (p + 8 + sz > end) return -3;
      p += 8 + sz;
      continue;
    }
    break;
  }
  Header h;
  int rc = parse_header(p, end - p, &h);
  if (rc) return rc;
  return h.content_size;
}

// Decompress one or more concatenated frames.  Returns total decompressed
// bytes, or a negative error.  verify != 0 also checks block/content
// xxh32 checksums when the frame carries them.
int64_t ldlz4_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                         int64_t cap, int verify) {
  if (!src || n < 4) return -3;
  const uint8_t* sp = src;
  const uint8_t* send = src + n;
  uint8_t* dp = dst;
  uint8_t* dend = dst + cap;
  bool saw_frame = false;
  while (sp < send) {
    if (send - sp < 4) return saw_frame ? -5 : -3;
    uint32_t magic = rd32(sp);
    if (magic >= MAGIC_SKIP_LO && magic <= MAGIC_SKIP_HI) {
      if (send - sp < 8) return -3;
      int64_t sz = rd32(sp + 4);
      if (sp + 8 + sz > send) return -3;
      sp += 8 + sz;
      continue;
    }
    Header h;
    int rc = parse_header(sp, send - sp, &h);
    if (rc) return rc;
    sp += h.hdr_len;
    saw_frame = true;
    uint8_t* frame_start = dp;
    for (;;) {
      if (send - sp < 4) return -3;
      uint32_t bsz = rd32(sp);
      sp += 4;
      if (bsz == 0) break;  // EndMark
      bool raw = bsz & 0x80000000u;
      int64_t len = bsz & 0x7FFFFFFFu;
      if (sp + len > send) return -3;
      if (verify && h.block_checksum) {
        if (send - (sp + len) < 4) return -3;
        if (xxh32(sp, len, 0) != rd32(sp + len)) return -6;
      }
      if (raw) {
        if (dp + len > dend) return -4;
        std::memcpy(dp, sp, len);
        dp += len;
      } else {
        // linked frames: matches may reach into earlier blocks of THIS
        // frame (never across frames)
        int64_t got = block_decode(sp, len, dp, dend - dp,
                                   h.block_indep ? 0 : dp - frame_start);
        if (got < 0) return got;
        dp += got;
      }
      sp += len + (h.block_checksum ? 4 : 0);
    }
    if (h.content_checksum) {
      if (send - sp < 4) return -3;
      if (verify &&
          xxh32(frame_start, dp - frame_start, 0) != rd32(sp)) return -6;
      sp += 4;
    }
    if (h.content_size >= 0 && dp - frame_start != h.content_size)
      return -5;
  }
  return dp - dst;
}

}  // extern "C"
