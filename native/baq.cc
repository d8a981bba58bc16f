/*
 * Base Alignment Quality (BAQ).
 *
 * Implements the glocal profile-HMM of Li H., "Improving SNP discovery by
 * base alignment quality", Bioinformatics 27(8), 2011 — the algorithm
 * behind `samtools calmd -r` / pysam pileup(compute_baq=True), which the
 * reference relies on via pysam (inStrain/profile/profile_utilities.py:150).
 *
 * Banded forward-backward over states {Match, Insert, Delete} between the
 * read and the reference segment spanned by its alignment; the posterior
 * probability that each base is aligned where the mapper put it becomes a
 * quality cap: bases whose most-likely HMM alignment disagrees with the
 * mapper get quality 0, others get min(original, phred(1 - posterior)).
 */
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct GlocalParams {
    double d;  // gap open
    double e;  // gap extension
    int bw;    // band width
};

// base codes: A0 C1 T2 G3 other 4 (>3 means ambiguous)
// state encoding in out_state[i]: (ref_offset << 2) | s, s: 0=M 1=I 2=D

// Banded glocal forward/backward with per-row scaling.
// ref: ref segment codes [l_ref], query codes [l_query], qual [l_query].
// out_state / out_q: per query base. Returns 0 on success.
int glocal(const uint8_t* ref, int l_ref, const uint8_t* query, int l_query,
           const uint8_t* qual, const GlocalParams& c,
           int* out_state, uint8_t* out_q) {
    if (l_ref <= 0 || l_query <= 0) return -1;
    int bw = c.bw < std::abs(l_ref - l_query) ? std::abs(l_ref - l_query) : c.bw;
    if (bw > l_ref) bw = l_ref;
    int bw2 = bw * 2 + 1;

    // transition matrix
    double sM = 1.0 / (2 * l_query + 2), sI = sM;
    double bM = (1 - c.d) / l_ref, bI = c.d / l_ref;
    double m[9];
    m[0 * 3 + 0] = (1 - c.d - c.d) * (1 - sM);
    m[0 * 3 + 1] = m[0 * 3 + 2] = c.d * (1 - sM);
    m[1 * 3 + 0] = (1 - c.e) * (1 - sI);
    m[1 * 3 + 1] = c.e * (1 - sI);
    m[1 * 3 + 2] = 0.0;
    m[2 * 3 + 0] = 1 - c.e;
    m[2 * 3 + 1] = 0.0;
    m[2 * 3 + 2] = c.e;

    // quality -> error prob
    std::vector<double> qp(l_query);
    for (int i = 0; i < l_query; ++i) {
        int q = qual[i] < 1 ? 1 : qual[i];
        qp[i] = std::pow(10.0, -q / 10.0);
    }

    auto set_u = [bw](int i, int k) -> int {
        // row i (query, 1-based), ref pos k (1-based) -> band slot
        int x = i - bw;
        if (x < 0) x = 0;
        return (k + 1 - x) * 3;
    };

    int ncell = (bw2 + 2) * 3;
    std::vector<double> f((l_query + 1) * ncell, 0.0);
    std::vector<double> b((l_query + 1) * ncell, 0.0);
    std::vector<double> s(l_query + 2, 0.0);

    const double EM = 1.0 / 3.0;  // mismatch emission spread
    const double EI = 0.25;       // insert emission

    // ---- forward ----
    {
        double* fi = &f[ncell];  // row i=1
        double sum = 0.0;
        int beg = 1, end = l_ref < bw + 1 ? l_ref : bw + 1;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(1, k);
            double e = (ref[k - 1] > 3 || query[0] > 3)
                           ? 1.0
                           : (ref[k - 1] == query[0] ? 1.0 - qp[0] : qp[0] * EM);
            fi[u + 0] = e * bM;
            fi[u + 1] = EI * bI;
            sum += fi[u] + fi[u + 1];
        }
        s[1] = sum;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(1, k);
            fi[u] /= sum; fi[u + 1] /= sum;
        }
    }
    for (int i = 2; i <= l_query; ++i) {
        double* fi = &f[i * ncell];
        double* fi1 = &f[(i - 1) * ncell];
        double sum = 0.0;
        int beg = i - bw < 1 ? 1 : i - bw;
        int end = i + bw < l_ref ? i + bw : l_ref;
        double qli = qp[i - 1];
        for (int k = beg; k <= end; ++k) {
            int u = set_u(i, k);
            int v = set_u(i - 1, k - 1);
            int w = set_u(i - 1, k);
            int x = set_u(i, k - 1);
            double e = (ref[k - 1] > 3 || query[i - 1] > 3)
                           ? 1.0
                           : (ref[k - 1] == query[i - 1] ? 1.0 - qli : qli * EM);
            // guard band edges: v/w/x may fall outside [0, ncell)
            double fM = 0, fI = 0, fD = 0;
            if (k > beg || i - bw >= 1 || k - 1 >= 1) {
                if (v >= 0 && v + 2 < ncell)
                    fM = e * (m[0] * fi1[v + 0] + m[3] * fi1[v + 1] +
                              m[6] * fi1[v + 2]);
            }
            if (w >= 0 && w + 1 < ncell)
                fI = EI * (m[1] * fi1[w + 0] + m[4] * fi1[w + 1]);
            if (x >= 0 && x + 2 < ncell)
                fD = m[2] * fi[x + 0] + m[8] * fi[x + 2];
            fi[u + 0] = fM; fi[u + 1] = fI; fi[u + 2] = fD;
            sum += fM + fI + fD;
        }
        if (sum <= 0) sum = 1e-300;
        s[i] = sum;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(i, k);
            fi[u] /= sum; fi[u + 1] /= sum; fi[u + 2] /= sum;
        }
    }
    // terminal
    {
        double sum = 0.0;
        double* fl = &f[l_query * ncell];
        int beg = l_query - bw < 1 ? 1 : l_query - bw;
        int end = l_query + bw < l_ref ? l_query + bw : l_ref;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(l_query, k);
            sum += fl[u] * sM + fl[u + 1] * sI;
        }
        s[l_query + 1] = sum;
    }

    // ---- backward ----
    {
        double* bl = &b[l_query * ncell];
        int beg = l_query - bw < 1 ? 1 : l_query - bw;
        int end = l_query + bw < l_ref ? l_query + bw : l_ref;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(l_query, k);
            bl[u + 0] = sM / s[l_query] / s[l_query + 1];
            bl[u + 1] = sI / s[l_query] / s[l_query + 1];
        }
    }
    for (int i = l_query - 1; i >= 1; --i) {
        double* bi = &b[i * ncell];
        double* bi1 = &b[(i + 1) * ncell];
        int beg = i - bw < 1 ? 1 : i - bw;
        int end = i + bw < l_ref ? i + bw : l_ref;
        double qli1 = qp[i];  // quality of base i+1 (0-based i)
        for (int k = end; k >= beg; --k) {
            int u = set_u(i, k);
            int v = set_u(i + 1, k + 1);
            int w = set_u(i + 1, k);
            int x = set_u(i, k + 1);
            double eM1 = 0;
            if (k < l_ref) {
                eM1 = (ref[k] > 3 || query[i] > 3)
                          ? 1.0
                          : (ref[k] == query[i] ? 1.0 - qli1 : qli1 * EM);
            }
            double bM = 0, bI = 0, bD = 0;
            double vM = (k < l_ref && v >= 0 && v < ncell) ? eM1 * bi1[v] : 0.0;
            double wI = (w >= 0 && w + 1 < ncell) ? EI * bi1[w + 1] : 0.0;
            double xD = (k < l_ref && x >= 0 && x + 2 < ncell) ? bi[x + 2] : 0.0;
            bM = m[0] * vM + m[1] * wI + m[2] * xD;
            bI = m[3] * vM + m[4] * wI;
            bD = m[6] * vM + m[8] * xD;
            bi[u + 0] = bM / s[i];
            bi[u + 1] = bI / s[i];
            bi[u + 2] = bD / s[i];
        }
    }

    // ---- posterior decoding per query base ----
    for (int i = 1; i <= l_query; ++i) {
        double* fi = &f[i * ncell];
        double* bi = &b[i * ncell];
        int beg = i - bw < 1 ? 1 : i - bw;
        int end = i + bw < l_ref ? i + bw : l_ref;
        double best = -1.0; int best_k = beg, best_s = 0;
        double sum = 0.0;
        for (int k = beg; k <= end; ++k) {
            int u = set_u(i, k);
            for (int st = 0; st < 2; ++st) {  // M and I only for query base
                double p = fi[u + st] * bi[u + st] * s[i];
                sum += p;
                if (p > best) { best = p; best_k = k; best_s = st; }
            }
        }
        double post = sum > 0 ? best / sum : 0.0;
        double perr = 1.0 - post;
        int q = perr <= 0 ? 93 : (int)(-10.0 * std::log10(perr) + 0.499);
        if (q > 93) q = 93;
        if (q < 0) q = 0;
        out_state[i - 1] = ((best_k - 1) << 2) | best_s;
        out_q[i - 1] = (uint8_t)q;
    }
    return 0;
}

}  // namespace

// CIGAR op helpers (BAM encoding: op = cigar & 0xf, len = cigar >> 4)
static inline int cg_op(uint32_t c) { return c & 0xf; }
static inline int cg_len(uint32_t c) { return c >> 4; }
enum { CMATCH = 0, CINS = 1, CDEL = 2, CREF_SKIP = 3, CSOFT = 4,
       CHARD = 5, CPAD = 6, CEQUAL = 7, CDIFF = 8 };

extern "C" int bd_baq_one(const uint8_t* ref, int64_t ref_len, int64_t pos,
                          const uint32_t* cigar, int n_cigar,
                          const uint8_t* seq_codes, const uint8_t* qual,
                          int l_qseq, uint8_t* out_qual) {
    // Find alignment extent: xb/xe on ref, yb/ye on query (as in the
    // samtools realignment wrapper).
    int64_t x = pos; int y = 0;
    int64_t xb = -1, xe = -1; int yb = -1, ye = -1;
    for (int k = 0; k < n_cigar; ++k) {
        int op = cg_op(cigar[k]), l = cg_len(cigar[k]);
        if (op == CMATCH || op == CEQUAL || op == CDIFF) {
            if (xb < 0) xb = x;
            if (yb < 0) yb = y;
            x += l; y += l;
            xe = x; ye = y;
        } else if (op == CINS || op == CSOFT) {
            y += l;
        } else if (op == CDEL) {
            x += l;
        } else if (op == CREF_SKIP) {
            return -1;  // spliced alignments: BAQ not applied
        }
    }
    if (xb < 0 || yb < 0) return -1;
    if (xe > ref_len) xe = ref_len;
    if (xe <= xb) return -1;

    int bw = 7;
    int64_t diff = (xe - xb) - (ye - yb);
    if (diff < 0) diff = -diff;
    if (diff > bw) bw = (int)diff + 3;

    int l_ref = (int)(xe - xb);
    int l_q = ye - yb;
    if (l_q <= 0 || l_q > 100000) return -1;

    std::vector<int> state(l_q);
    std::vector<uint8_t> bq(l_q);
    GlocalParams conf{0.001, 0.1, bw};
    if (glocal(ref + xb, l_ref, seq_codes + yb, l_q, qual + yb, conf,
               state.data(), bq.data()) != 0)
        return -1;

    // Apply: cap each M-op base at its posterior quality; zero bases whose
    // best realignment disagrees with the mapper's placement.
    memcpy(out_qual, qual, l_qseq);
    x = pos; y = 0;
    for (int k = 0; k < n_cigar; ++k) {
        int op = cg_op(cigar[k]), l = cg_len(cigar[k]);
        if (op == CMATCH || op == CEQUAL || op == CDIFF) {
            for (int i = y; i < y + l; ++i) {
                int z = i - yb;
                if (z < 0 || z >= l_q) continue;
                int exp_off = (int)(x - xb + (i - y));
                if ((state[z] & 3) != 0 || (state[z] >> 2) != exp_off)
                    out_qual[i] = 0;
                else
                    out_qual[i] = out_qual[i] < bq[z] ? out_qual[i] : bq[z];
            }
            x += l; y += l;
        } else if (op == CINS || op == CSOFT) {
            y += l;
        } else if (op == CDEL) {
            x += l;
        }
    }
    return 0;
}
