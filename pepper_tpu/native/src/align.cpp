// Local read-to-reference realignment (polish path).
//
// The reference uses a DeepVariant-derived two-pass realigner: k-mer index
// fast pass, then striped Smith-Waterman fallback
// (pepper/modules/src/local_reassembly/aligner.cpp, ssw.c). This is a
// from-scratch affine-gap local aligner (Gotoh DP with traceback) using the
// same scoring constants (match 4, mismatch 6, gap open 8, extend 2 —
// aligner.h:22-28). Produces a new (pos, CIGAR) per read with soft-clipped
// unaligned ends; same contract as ReadAligner.align_reads_to_reference.
#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

constexpr int MATCH = 4, MISMATCH = 6, GAP_OPEN = 8, GAP_EXT = 2;
constexpr int OP_M = 0, OP_I = 1, OP_D = 2, OP_S = 4;

struct Cell {
  int32_t h, e, f;
};

}  // namespace

extern "C" {

// Aligns one query to the reference window. Outputs: new 0-based ref offset
// (into ref), cigar ops/lens written into caller buffers (cap = max ops),
// returns number of ops (0 => no alignment / keep original).
int ssw_align_one(const char* ref, int32_t ref_len, const char* query,
                  int32_t query_len, int32_t* out_ref_offset,
                  uint8_t* out_ops, int32_t* out_lens, int32_t cap) {
  if (ref_len <= 0 || query_len <= 0) return 0;
  const int32_t NEG = -1000000;
  // Gotoh affine-gap DP with 3-state traceback: TH records which matrix
  // produced H (0 stop, 1 diag, 2 E, 3 F); TE/TF record gap extension
  // (1 = extend, 0 = open from H).
  std::vector<int32_t> H((size_t)(query_len + 1) * (ref_len + 1), 0);
  std::vector<int32_t> E((size_t)(query_len + 1) * (ref_len + 1), NEG);
  std::vector<int32_t> F((size_t)(query_len + 1) * (ref_len + 1), NEG);
  std::vector<uint8_t> TH((size_t)(query_len + 1) * (ref_len + 1), 0);
  std::vector<uint8_t> TE((size_t)(query_len + 1) * (ref_len + 1), 0);
  std::vector<uint8_t> TF((size_t)(query_len + 1) * (ref_len + 1), 0);
  auto at = [&](int i, int j) { return (size_t)i * (ref_len + 1) + j; };

  int32_t best = 0, bi = 0, bj = 0;
  for (int i = 1; i <= query_len; i++) {
    for (int j = 1; j <= ref_len; j++) {
      int32_t e_ext = E[at(i - 1, j)] - GAP_EXT;
      int32_t e_open = H[at(i - 1, j)] - GAP_OPEN;
      int32_t e = std::max(e_ext, e_open);
      TE[at(i, j)] = e_ext >= e_open ? 1 : 0;
      int32_t f_ext = F[at(i, j - 1)] - GAP_EXT;
      int32_t f_open = H[at(i, j - 1)] - GAP_OPEN;
      int32_t f = std::max(f_ext, f_open);
      TF[at(i, j)] = f_ext >= f_open ? 1 : 0;
      int32_t diag = H[at(i - 1, j - 1)]
                     + (query[i - 1] == ref[j - 1] ? MATCH : -MISMATCH);
      int32_t h = std::max({0, diag, e, f});
      E[at(i, j)] = e;
      F[at(i, j)] = f;
      H[at(i, j)] = h;
      uint8_t m = 0;
      if (h == 0) m = 0;
      else if (h == diag) m = 1;
      else if (h == e) m = 2;
      else m = 3;
      TH[at(i, j)] = m;
      if (h > best) { best = h; bi = i; bj = j; }
    }
  }
  if (best <= 0) return 0;

  // 3-state traceback from (bi, bj) to a zero cell
  std::vector<std::pair<uint8_t, int32_t>> rev_ops;
  int i = bi, j = bj;
  auto push = [&](uint8_t op) {
    if (!rev_ops.empty() && rev_ops.back().first == op)
      rev_ops.back().second++;
    else
      rev_ops.emplace_back(op, 1);
  };
  int state = 0;  // 0 = H, 1 = E, 2 = F
  while (i > 0 && j > 0) {
    if (state == 0) {
      uint8_t m = TH[at(i, j)];
      if (m == 0 || H[at(i, j)] <= 0) break;
      if (m == 1) { push(OP_M); i--; j--; }
      else if (m == 2) state = 1;
      else state = 2;
    } else if (state == 1) {
      push(OP_I);
      uint8_t ext = TE[at(i, j)];
      i--;
      if (!ext) state = 0;
    } else {
      push(OP_D);
      uint8_t ext = TF[at(i, j)];
      j--;
      if (!ext) state = 0;
    }
  }
  int32_t q_start = i;          // soft-clipped prefix length
  int32_t q_end_clip = query_len - bi;
  *out_ref_offset = j;

  int n = 0;
  if (q_start > 0) {
    if (n >= cap) return 0;
    out_ops[n] = OP_S; out_lens[n] = q_start; n++;
  }
  for (auto it = rev_ops.rbegin(); it != rev_ops.rend(); ++it) {
    if (n >= cap) return 0;
    out_ops[n] = it->first; out_lens[n] = it->second; n++;
  }
  if (q_end_clip > 0) {
    if (n >= cap) return 0;
    out_ops[n] = OP_S; out_lens[n] = q_end_clip; n++;
  }
  return n;
}

}  // extern "C"
