// Native BAM region fetch: BGZF inflate + record parse + region trim.
//
// The hot path of stage 1 (SURVEY.md §3.5 #1): the reference implements this
// in C++/htslib (pepper_variant/modules/cpp/bam_handler.cpp). This is a
// from-scratch implementation against the BAM/BGZF specs using zlib only.
// Trim semantics mirror pepper_tpu/io/bam_reader.py::trim_read exactly
// (which itself mirrors bam_handler.cpp:174-307); the Python reader is the
// semantic oracle in tests/test_native_io.py.
//
// C ABI: the caller (ctypes) passes the BGZF chunk list from the .bai and
// receives one flat ReadSet of trimmed reads (struct-of-arrays, single
// malloc block per array) for zero-copy numpy views.
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <zlib.h>

namespace {

constexpr int OP_M = 0, OP_I = 1, OP_D = 2, OP_N = 3, OP_S = 4, OP_H = 5,
              OP_P = 6, OP_EQ = 7, OP_X = 8;
constexpr uint16_t FLAG_UNMAPPED = 4, FLAG_SECONDARY = 256, FLAG_QCFAIL = 512,
                   FLAG_DUP = 1024, FLAG_SUPPLEMENTARY = 2048;

const char SEQ_NT16[] = "=ACMGRSVTWYHKDBN";

struct BGZFCursor {
  FILE* fh = nullptr;
  // current inflated block
  std::vector<uint8_t> block;
  size_t block_off = 0;     // cursor within block
  int64_t coffset = -1;     // compressed offset of current block
  int64_t next_coffset = 0; // compressed offset of the next block

  bool load_block(int64_t coff) {
    if (fseeko(fh, coff, SEEK_SET) != 0) return false;
    uint8_t hdr[18];
    if (fread(hdr, 1, 18, fh) != 18) return false;
    if (hdr[0] != 0x1f || hdr[1] != 0x8b) return false;
    uint16_t xlen = hdr[10] | (hdr[11] << 8);
    // find BSIZE in the extra field (SI1=66,SI2=67)
    std::vector<uint8_t> extra(xlen);
    // we already read 6 bytes of extra in hdr[12..17]
    memcpy(extra.data(), hdr + 12, xlen < 6 ? xlen : 6);
    if (xlen > 6 && fread(extra.data() + 6, 1, xlen - 6, fh) != xlen - 6)
      return false;
    int bsize = -1;
    for (size_t i = 0; i + 4 <= extra.size();) {
      uint8_t si1 = extra[i], si2 = extra[i + 1];
      uint16_t slen = extra[i + 2] | (extra[i + 3] << 8);
      if (si1 == 66 && si2 == 67 && slen == 2)
        bsize = (extra[i + 4] | (extra[i + 5] << 8)) + 1;
      i += 4 + slen;
    }
    if (bsize < 0) return false;
    size_t cdata_len = bsize - 12 - xlen - 8;  // minus header+footer
    std::vector<uint8_t> cdata(cdata_len);
    if (fseeko(fh, coff + 12 + xlen, SEEK_SET) != 0) return false;
    if (fread(cdata.data(), 1, cdata_len, fh) != cdata_len) return false;
    uint8_t footer[8];
    if (fread(footer, 1, 8, fh) != 8) return false;
    uint32_t isize = footer[4] | (footer[5] << 8) | (footer[6] << 16)
                     | ((uint32_t)footer[7] << 24);
    block.resize(isize);
    if (isize > 0) {
      z_stream zs{};
      if (inflateInit2(&zs, -15) != Z_OK) return false;
      zs.next_in = cdata.data();
      zs.avail_in = (uInt)cdata_len;
      zs.next_out = block.data();
      zs.avail_out = isize;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) return false;
    }
    coffset = coff;
    next_coffset = coff + bsize;
    block_off = 0;
    return true;
  }

  bool seek_virtual(uint64_t voff) {
    int64_t coff = (int64_t)(voff >> 16);
    uint16_t uoff = (uint16_t)(voff & 0xFFFF);
    if (coff != coffset && !load_block(coff)) return false;
    if (uoff > block.size()) return false;
    block_off = uoff;
    return true;
  }

  uint64_t virtual_offset() const {
    if (block_off >= block.size() && coffset >= 0)
      return ((uint64_t)next_coffset) << 16;
    return (((uint64_t)coffset) << 16) | (uint64_t)block_off;
  }

  // read n bytes spanning blocks; returns false on EOF
  bool read(uint8_t* dst, size_t n) {
    size_t got = 0;
    while (got < n) {
      if (block_off >= block.size()) {
        if (!load_block(next_coffset)) return false;
        if (block.empty()) {
          // EOF marker block (isize 0)
          if (block_off >= block.size() && feof(fh)) return false;
          continue;
        }
      }
      size_t take = std::min(n - got, block.size() - block_off);
      memcpy(dst + got, block.data() + block_off, take);
      block_off += take;
      got += take;
    }
    return true;
  }
};

struct Builder {
  std::vector<int64_t> pos, pos_end, seq_offset, cigar_offset, bad_offset,
      name_offset;
  std::vector<int32_t> mapq, flags, hp, seq_len, cigar_len, bad_len, name_len,
      cigar_lens, bad_buf;
  std::vector<uint8_t> cigar_ops, qual_buf;
  std::vector<char> seq_buf, name_buf;
};

}  // namespace

extern "C" {

typedef struct {
  int32_t n_reads;
  int64_t *pos, *pos_end, *seq_offset, *cigar_offset, *bad_offset, *name_offset;
  int32_t *mapq, *flags, *hp, *seq_len, *cigar_len, *bad_len, *name_len;
  int32_t *cigar_lens, *bad_buf;
  uint8_t *cigar_ops, *qual_buf;
  char *seq_buf, *name_buf;
  int64_t seq_buf_len, cigar_buf_len, bad_buf_len, name_buf_len;
} ReadSet;

static int64_t* dup64(const std::vector<int64_t>& v) {
  auto* p = (int64_t*)malloc(v.size() * sizeof(int64_t) + 1);
  memcpy(p, v.data(), v.size() * sizeof(int64_t));
  return p;
}
static int32_t* dup32(const std::vector<int32_t>& v) {
  auto* p = (int32_t*)malloc(v.size() * sizeof(int32_t) + 1);
  memcpy(p, v.data(), v.size() * sizeof(int32_t));
  return p;
}
static uint8_t* dup8(const std::vector<uint8_t>& v) {
  auto* p = (uint8_t*)malloc(v.size() + 1);
  memcpy(p, v.data(), v.size());
  return p;
}
static char* dupc(const std::vector<char>& v) {
  auto* p = (char*)malloc(v.size() + 1);
  memcpy(p, v.data(), v.size());
  return p;
}

void readset_free(ReadSet* rs) {
  if (!rs) return;
  free(rs->pos); free(rs->pos_end); free(rs->seq_offset);
  free(rs->cigar_offset); free(rs->bad_offset); free(rs->name_offset);
  free(rs->mapq); free(rs->flags); free(rs->hp); free(rs->seq_len);
  free(rs->cigar_len); free(rs->bad_len); free(rs->name_len);
  free(rs->cigar_lens); free(rs->bad_buf); free(rs->cigar_ops);
  free(rs->qual_buf); free(rs->seq_buf); free(rs->name_buf);
  free(rs);
}

// Parse the aux blob for an integer HP tag.
static int parse_hp(const uint8_t* aux, size_t n) {
  size_t i = 0;
  while (i + 4 <= n) {
    const uint8_t* tag = aux + i;
    uint8_t typ = aux[i + 2];
    i += 3;
    long val = 0;
    switch (typ) {
      case 'c': val = (int8_t)aux[i]; i += 1; break;
      case 'C': val = aux[i]; i += 1; break;
      case 's': { int16_t v; memcpy(&v, aux + i, 2); val = v; i += 2; } break;
      case 'S': { uint16_t v; memcpy(&v, aux + i, 2); val = v; i += 2; } break;
      case 'i': { int32_t v; memcpy(&v, aux + i, 4); val = v; i += 4; } break;
      case 'I': { uint32_t v; memcpy(&v, aux + i, 4); val = v; i += 4; } break;
      case 'A': i += 1; continue;
      case 'f': i += 4; continue;
      case 'Z': case 'H': {
        while (i < n && aux[i] != 0) i++;
        i++;
        continue;
      }
      case 'B': {
        uint8_t sub = aux[i];
        uint32_t count;
        memcpy(&count, aux + i + 1, 4);
        int size = (sub == 'c' || sub == 'C') ? 1
                   : (sub == 's' || sub == 'S') ? 2 : 4;
        i += 5 + (size_t)count * size;
        continue;
      }
      default: return 0;
    }
    if (tag[0] == 'H' && tag[1] == 'P') return (int)val;
  }
  return 0;
}

ReadSet* bam_fetch_region(const char* bam_path, const uint64_t* chunks,
                          int n_chunks, int32_t want_ref, int64_t start,
                          int64_t stop, int include_suppl, int min_mapq,
                          int min_baseq) {
  FILE* fh = fopen(bam_path, "rb");
  if (!fh) return nullptr;
  BGZFCursor cur;
  cur.fh = fh;
  Builder b;
  std::vector<uint8_t> rec;
  std::vector<char> seq;
  std::vector<uint8_t> qual;
  std::vector<std::pair<int, int>> cig;

  for (int c = 0; c < n_chunks; c++) {
    uint64_t vbeg = chunks[2 * c], vend = chunks[2 * c + 1];
    if (!cur.seek_virtual(vbeg)) continue;
    while (cur.virtual_offset() < vend) {
      uint8_t szb[4];
      if (!cur.read(szb, 4)) break;
      int32_t block_size;
      memcpy(&block_size, szb, 4);
      if (block_size <= 0) break;
      rec.resize(block_size);
      if (!cur.read(rec.data(), block_size)) break;

      int32_t ref_id, rpos, l_seq, next_ref, next_pos, tlen;
      memcpy(&ref_id, rec.data(), 4);
      memcpy(&rpos, rec.data() + 4, 4);
      uint8_t l_read_name = rec[8];
      uint8_t mapq = rec[9];
      uint16_t n_cigar, flag;
      memcpy(&n_cigar, rec.data() + 12, 2);
      memcpy(&flag, rec.data() + 14, 2);
      memcpy(&l_seq, rec.data() + 16, 4);
      memcpy(&next_ref, rec.data() + 20, 4);
      memcpy(&next_pos, rec.data() + 24, 4);
      memcpy(&tlen, rec.data() + 28, 4);
      size_t off = 32;
      const char* name = (const char*)rec.data() + off;
      int name_n = l_read_name - 1;
      off += l_read_name;

      if (ref_id != want_ref) continue;
      if (rpos >= stop) break;  // next chunk (bam_reader.py:329)
      if (flag & (FLAG_QCFAIL | FLAG_DUP | FLAG_SECONDARY | FLAG_UNMAPPED))
        { continue; }
      if (!include_suppl && (flag & FLAG_SUPPLEMENTARY)) continue;
      if (mapq < min_mapq) continue;

      cig.clear();
      {
        int64_t ref_span = 0;
        for (int k = 0; k < n_cigar; k++) {
          uint32_t v;
          memcpy(&v, rec.data() + off + 4 * k, 4);
          int op = v & 0xF, len = v >> 4;
          cig.emplace_back(op, len);
          if (op == OP_M || op == OP_D || op == OP_N || op == OP_EQ ||
              op == OP_X)
            ref_span += len;
        }
        off += 4ull * n_cigar;
        if (rpos + ref_span <= start) continue;
      }

      // 4-bit seq decode, uppercased by table
      seq.resize(l_seq);
      {
        const uint8_t* sb = rec.data() + off;
        for (int k = 0; k < l_seq; k++) {
          uint8_t code = (k % 2 == 0) ? (sb[k / 2] >> 4) : (sb[k / 2] & 0xF);
          seq[k] = SEQ_NT16[code];
        }
        off += (l_seq + 1) / 2;
      }
      qual.assign(rec.data() + off, rec.data() + off + l_seq);
      off += l_seq;
      int hp = parse_hp(rec.data() + off, rec.size() - off);

      // ---- trim to [start, stop] (mirrors bam_reader.py trim_read) ----
      {
        int64_t current_pos = rpos;
        int64_t read_index = 0;
        int64_t p_start = -1, p_end = -1;
        size_t seq0 = b.seq_buf.size();
        size_t cig0 = b.cigar_ops.size();
        size_t bad0 = b.bad_buf.size();
        for (auto [op, length] : cig) {
          if (current_pos > stop) break;
          if (op == OP_M || op == OP_EQ || op == OP_X) {
            int64_t skip = 0;
            if (current_pos < start) {
              skip = std::min<int64_t>(start - current_pos, length);
              read_index += skip;
              current_pos += skip;
            }
            int64_t n = length - skip;
            int64_t kept = std::min<int64_t>(n, stop - current_pos + 1);
            if (kept > 0) {
              if (p_start == -1) { p_start = current_pos; p_end = p_start; }
              for (int64_t k = 0; k < kept; k++) {
                char base = seq[read_index + k];
                uint8_t q = qual[read_index + k];
                if (q < min_baseq ||
                    (base != 'A' && base != 'C' && base != 'G' && base != 'T'))
                  b.bad_buf.push_back(
                      (int32_t)(b.seq_buf.size() - seq0 + k));
              }
              b.seq_buf.insert(b.seq_buf.end(), seq.begin() + read_index,
                               seq.begin() + read_index + kept);
              b.qual_buf.insert(b.qual_buf.end(), qual.begin() + read_index,
                                qual.begin() + read_index + kept);
              b.cigar_ops.push_back((uint8_t)op);
              b.cigar_lens.push_back((int32_t)kept);
              p_end += kept;
            }
            read_index += n;
            current_pos += n;
          } else if (op == OP_S || op == OP_I) {
            if (start <= current_pos && current_pos <= stop && p_start != -1) {
              for (int64_t k = 0; k < length; k++) {
                char base = seq[read_index + k];
                uint8_t q = qual[read_index + k];
                if (q < min_baseq ||
                    (base != 'A' && base != 'C' && base != 'G' && base != 'T'))
                  b.bad_buf.push_back(
                      (int32_t)(b.seq_buf.size() - seq0 + k));
              }
              b.seq_buf.insert(b.seq_buf.end(), seq.begin() + read_index,
                               seq.begin() + read_index + length);
              b.qual_buf.insert(b.qual_buf.end(), qual.begin() + read_index,
                                qual.begin() + read_index + length);
              b.cigar_ops.push_back((uint8_t)op);
              b.cigar_lens.push_back((int32_t)length);
            }
            read_index += length;
          } else if (op == OP_N || op == OP_D) {
            if (start <= current_pos && current_pos <= stop && p_start != -1) {
              int64_t kept = std::min<int64_t>(length, stop - current_pos + 1);
              if (kept > 0) {
                b.cigar_ops.push_back((uint8_t)op);
                b.cigar_lens.push_back((int32_t)kept);
                p_end += kept;
              }
              current_pos += length;
            } else {
              current_pos += length;
            }
          } else if (op == OP_P) {
            current_pos += length;
          }  // OP_H: nothing
        }
        int64_t kept_total = (int64_t)(b.seq_buf.size() - seq0);
        if (kept_total == 0) {
          // roll back cigar/bad writes from skipped-read path
          b.cigar_ops.resize(cig0);
          b.cigar_lens.resize(cig0);
          b.bad_buf.resize(bad0);
          continue;
        }
        // sentinel parity with python: bad.append(len(seq)+1)
        b.bad_buf.push_back((int32_t)kept_total + 1);
        b.pos.push_back(p_start);
        b.pos_end.push_back(p_end);
        b.mapq.push_back(mapq);
        b.flags.push_back(flag);
        b.hp.push_back(hp);
        b.seq_offset.push_back((int64_t)seq0);
        b.seq_len.push_back((int32_t)kept_total);
        b.cigar_offset.push_back((int64_t)cig0);
        b.cigar_len.push_back((int32_t)(b.cigar_ops.size() - cig0));
        b.bad_offset.push_back((int64_t)bad0);
        b.bad_len.push_back((int32_t)(b.bad_buf.size() - bad0));
        b.name_offset.push_back((int64_t)b.name_buf.size());
        b.name_len.push_back(name_n);
        b.name_buf.insert(b.name_buf.end(), name, name + name_n);
      }
    }
  }
  fclose(fh);
  auto* rs = (ReadSet*)calloc(1, sizeof(ReadSet));
  rs->n_reads = (int32_t)b.pos.size();
  rs->pos = dup64(b.pos);
  rs->pos_end = dup64(b.pos_end);
  rs->seq_offset = dup64(b.seq_offset);
  rs->cigar_offset = dup64(b.cigar_offset);
  rs->bad_offset = dup64(b.bad_offset);
  rs->name_offset = dup64(b.name_offset);
  rs->mapq = dup32(b.mapq);
  rs->flags = dup32(b.flags);
  rs->hp = dup32(b.hp);
  rs->seq_len = dup32(b.seq_len);
  rs->cigar_len = dup32(b.cigar_len);
  rs->bad_len = dup32(b.bad_len);
  rs->name_len = dup32(b.name_len);
  rs->cigar_lens = dup32(b.cigar_lens);
  rs->bad_buf = dup32(b.bad_buf);
  rs->cigar_ops = dup8(b.cigar_ops);
  rs->qual_buf = dup8(b.qual_buf);
  rs->seq_buf = dupc(b.seq_buf);
  rs->name_buf = dupc(b.name_buf);
  rs->seq_buf_len = (int64_t)b.seq_buf.size();
  rs->cigar_buf_len = (int64_t)b.cigar_ops.size();
  rs->bad_buf_len = (int64_t)b.bad_buf.size();
  rs->name_buf_len = (int64_t)b.name_buf.size();
  return rs;
}

}  // extern "C"
