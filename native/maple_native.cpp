// Native genome-list kernel library.
//
// C++ twin of maple_tpu/core/kernels.py + genomelist.py: the exact sparse
// partial-likelihood kernels over run-length genome lists (two-pointer
// merges with the {R,N,O,nuc}^2 case matrix), written for bit-identical
// IEEE-double results with the Python host kernels (which are themselves
// bit-identical to the reference implementation).  See
// maple_tpu/native/bridge.py for the ctypes binding.
//
// Exactness notes:
//  - all arithmetic is plain double in the same order as the Python code;
//  - 4-vector normalization sums use Neumaier compensation to match
//    CPython 3.12's builtin sum() (see neumaier_sum4);
//  - entry tuple layouts are encoded in per-entry presence bits so that
//    exported tuples reproduce the reference's variable-length layouts.
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <vector>
#include <limits>
#include <algorithm>

namespace {

constexpr int TYPE_R = 4;
constexpr int TYPE_N = 5;
constexpr int TYPE_O = 6;

constexpr uint8_t BIT_BL1 = 1;
constexpr uint8_t BIT_BL2 = 2;
constexpr uint8_t BIT_FLAG = 4;   // the error-model tip flag VALUE

struct Entry {
    int8_t type;
    uint8_t bits;
    int32_t val;      // end position (R/N) or local-ref nucleotide (nuc/O)
    double bl1;
    double bl2;
    double probs[4];  // O entries only

    bool has_bl1() const { return bits & BIT_BL1; }
    bool has_bl2() const { return bits & BIT_BL2; }
    bool flag() const { return bits & BIT_FLAG; }
};

using Vec = std::vector<Entry>;

struct Store {
    int lRef = 0;
    // reference tables
    std::vector<int8_t> ref_indices;
    double root_freqs[4] = {0, 0, 0, 0};
    double root_freqs_log[4] = {0, 0, 0, 0};
    std::vector<int32_t> cumulative_bases;  // (lRef+1)*4
    // model state
    double mut[4][4] = {};
    std::vector<double> cumulative_rate;    // lRef+1
    bool use_rate_variation = false;
    std::vector<double> site_rates;         // lRef (scales mut per site)
    bool using_error_rate = false;
    bool site_err = false;
    double error_rate = 0.0;
    std::vector<double> error_rates;        // lRef
    std::vector<double> cumulative_error_rate;  // lRef+1
    double tot_error = 0.0;
    std::vector<double> rfle_cum;           // lRef+1
    // thresholds
    double threshold_prob = 1e-8;
    double threshold_prob4 = 1e-32;
    double min_carry = 0.0;
    double global_tot_rate = 0.0;
    double min_blen_sensitivity = 0.0;
    double threshold_diff_update = 1e-5;
    double threshold_fold_change = 1.01;
    // vector slots (freelist)
    std::vector<Vec> vecs;
    std::vector<int64_t> free_slots;

    int64_t alloc() {
        if (!free_slots.empty()) {
            int64_t id = free_slots.back();
            free_slots.pop_back();
            vecs[id].clear();
            return id;
        }
        vecs.emplace_back();
        return (int64_t)vecs.size() - 1;
    }
    Vec &v(int64_t id) { return vecs[id]; }

    // per-site matrix entry: mut[i][j] * site_rate
    inline double mm(int pos, int i, int j) const {
        if (use_rate_variation) return mut[i][j] * site_rates[pos];
        return mut[i][j];
    }
    inline double eps_at(int pos) const {
        return site_err ? error_rates[pos] : error_rate;
    }
};

const double DBL_MIN_POS = std::numeric_limits<double>::min();

// CPython 3.12 builtin sum() float fast path (Neumaier compensation).
inline double neumaier_sum4(const double *x) {
    double total = 0.0, c = 0.0;
    for (int i = 0; i < 4; i++) {
        double t = total + x[i];
        if (std::fabs(total) >= std::fabs(x[i]))
            c += (total - t) + x[i];
        else
            c += (x[i] - t) + total;
        total = t;
    }
    return total + c;
}

// ---------------------------------------------------------------- helpers

// getPartialVec (reference :4073-4141): first-order evolution of a one-site
// likelihood 4-vector.  mm is indexed at `pos` through the store.
inline void partial_vec_O(const Store &S, int pos, double tot_len,
                          const double *vect, bool up_node, double *out) {
    if (tot_len == 0.0) {
        for (int i = 0; i < 4; i++) out[i] = vect[i];
        return;
    }
    if (up_node) {
        for (int i = 0; i < 4; i++) {
            double tot = (S.mm(pos, 0, i) * vect[0] + S.mm(pos, 1, i) * vect[1]
                          + S.mm(pos, 2, i) * vect[2]
                          + S.mm(pos, 3, i) * vect[3]) * tot_len + vect[i];
            if (tot < 0) {
                out[0] = out[1] = out[2] = out[3] = 0.25;
                return;
            }
            out[i] = tot;
        }
    } else {
        for (int i = 0; i < 4; i++) {
            double tot = (S.mm(pos, i, 0) * vect[0] + S.mm(pos, i, 1) * vect[1]
                          + S.mm(pos, i, 2) * vect[2]
                          + S.mm(pos, i, 3) * vect[3]) * tot_len + vect[i];
            if (tot < 0) {
                out[0] = out[1] = out[2] = out[3] = 0.25;
                return;
            }
            out[i] = tot;
        }
    }
}

inline void partial_vec_nuc(const Store &S, int pos, int i12, double tot_len,
                            double eps, bool flag, bool up_node,
                            double *out) {
    if (flag) {
        double base[4] = {eps * 0.33333, eps * 0.33333, eps * 0.33333,
                          eps * 0.33333};
        base[i12] = 1.0 - eps;
        if (tot_len == 0.0) {
            for (int i = 0; i < 4; i++) out[i] = base[i];
            return;
        }
        for (int j = 0; j < 4; j++) {
            double tot = (S.mm(pos, j, 0) * base[0] + S.mm(pos, j, 1) * base[1]
                          + S.mm(pos, j, 2) * base[2]
                          + S.mm(pos, j, 3) * base[3]) * tot_len + base[j];
            if (tot < 0) {
                out[0] = out[1] = out[2] = out[3] = 0.25;
                return;
            }
            out[j] = tot;
        }
        return;
    }
    if (tot_len == 0.0) {
        out[0] = out[1] = out[2] = out[3] = 0.0;
        out[i12] = 1.0;
        return;
    }
    if (up_node) {
        for (int i = 0; i < 4; i++) out[i] = S.mm(pos, i12, i) * tot_len;
    } else {
        for (int i = 0; i < 4; i++) out[i] = S.mm(pos, i, i12) * tot_len;
    }
    out[i12] += 1.0;
    if (out[i12] < 0) {
        out[0] = out[1] = out[2] = out[3] = 0.25;
    }
}

// simplify (reference :3697-3717)
inline int simplify4(const Store &S, const double *vec, int ref_nuc) {
    double max_p = 0.0;
    int max_i = 0, num_above = 0;
    for (int i = 0; i < 4; i++) {
        if (vec[i] > max_p) { max_p = vec[i]; max_i = i; }
        if (vec[i] > S.threshold_prob) num_above++;
    }
    if (max_p < S.threshold_prob4) return -1;  // degenerate - caller raises
    if (num_above == 1) return max_i == ref_nuc ? TYPE_R : max_i;
    return TYPE_O;
}

inline Entry make_nuc(int type, int32_t val, uint8_t bits, double bl1,
                      double bl2) {
    Entry e{};
    e.type = (int8_t)type;
    e.val = val;
    e.bits = bits;
    e.bl1 = bl1;
    e.bl2 = bl2;
    return e;
}

inline Entry make_O(int32_t val, bool has_bl, double bl, const double *probs) {
    Entry e{};
    e.type = TYPE_O;
    e.val = val;
    e.bits = has_bl ? BIT_BL1 : 0;
    e.bl1 = bl;
    for (int i = 0; i < 4; i++) e.probs[i] = probs[i];
    return e;
}

// effective python tuple length of an entry (for layout-sensitive rules)
inline int tuple_len(const Store &S, const Entry &e) {
    if (e.type == TYPE_N) return 2;
    if (e.type == TYPE_O) return e.has_bl1() ? 4 : 3;
    int n = 2;
    if (e.has_bl1()) n += 1;
    if (e.has_bl2()) n += 1;
    if (S.using_error_rate && e.has_bl1()) n += 1;  // flag accompanies bl1
    return n;
}

// shorten (reference :3721-3745): merge adjacent compatible R runs.
void shorten_vec(const Store &S, Vec &v) {
    size_t i = 0;
    while (i + 1 < v.size()) {
        const Entry &prev = v[i];
        const Entry &cur = v[i + 1];
        if (cur.type == TYPE_R && prev.type == TYPE_R
                && tuple_len(S, cur) == tuple_len(S, prev)) {
            int n = tuple_len(S, cur);
            bool merge = false;
            if (n == 2) merge = true;
            else if (std::fabs(cur.bl1 - prev.bl1) > S.threshold_prob) {
                i++; continue;
            } else if (n == 3) merge = true;
            else if (!cur.has_bl2()) {
                // n==4 with uer: (c,v,bl1,flag) - compare flags
                if (cur.flag() == prev.flag()) merge = true;
            } else if (std::fabs(cur.bl2 - prev.bl2) > S.threshold_prob) {
                i++; continue;
            } else if (n == 4) merge = true;
            else if (cur.flag() == prev.flag()) merge = true;
            if (merge) {
                v.erase(v.begin() + i);
                continue;
            }
        }
        i++;
    }
}

// ------------------------------------------------------- emission helpers
// Survivor-entry emissions for one-side-N merge cases (see Python
// _emit_survivor_lower / _emit_survivor_upper, reference :4501-4643).

void emit_survivor_lower(const Store &S, Vec &out, const Entry &e,
                         int32_t new_el, double blen, bool from_tip,
                         bool is_up_down) {
    bool uer = S.using_error_rate;
    if (is_up_down) {
        if (uer) {
            if (!e.has_bl1()) {
                if (blen != 0.0 || from_tip)
                    out.push_back(make_nuc(e.type, new_el,
                                           BIT_BL1 | BIT_BL2
                                           | (from_tip ? BIT_FLAG : 0),
                                           blen, 0.0));
                else
                    out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
            } else {
                out.push_back(make_nuc(e.type, new_el,
                                       BIT_BL1 | BIT_BL2
                                       | (e.flag() ? BIT_FLAG : 0),
                                       e.bl1 + blen, 0.0));
            }
        } else {
            if (e.has_bl1())
                out.push_back(make_nuc(e.type, new_el, BIT_BL1 | BIT_BL2,
                                       e.bl1 + blen, 0.0));
            else if (blen != 0.0)
                out.push_back(make_nuc(e.type, new_el, BIT_BL1 | BIT_BL2,
                                       blen, 0.0));
            else
                out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
        }
    } else {
        if (uer) {
            if (!e.has_bl1()) {
                if (blen != 0.0 || from_tip)
                    out.push_back(make_nuc(e.type, new_el,
                                           BIT_BL1
                                           | (from_tip ? BIT_FLAG : 0),
                                           blen, 0.0));
                else
                    out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
            } else {
                out.push_back(make_nuc(e.type, new_el,
                                       BIT_BL1 | (e.flag() ? BIT_FLAG : 0),
                                       e.bl1 + blen, 0.0));
            }
        } else {
            if (e.has_bl1())
                out.push_back(make_nuc(e.type, new_el, BIT_BL1,
                                       e.bl1 + blen, 0.0));
            else if (blen != 0.0)
                out.push_back(make_nuc(e.type, new_el, BIT_BL1, blen, 0.0));
            else
                out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
        }
    }
}

void emit_survivor_upper(const Store &S, Vec &out, const Entry &e,
                         int32_t new_el, double blen, bool from_tip,
                         bool is_up_down) {
    bool uer = S.using_error_rate;
    if (is_up_down) {
        if (uer) {
            if (!e.has_bl1()) {
                if (blen != 0.0)
                    out.push_back(make_nuc(e.type, new_el, BIT_BL1, blen,
                                           0.0));
                else
                    out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
            } else if (!e.has_bl2()) {
                out.push_back(make_nuc(e.type, new_el,
                                       BIT_BL1 | (e.flag() ? BIT_FLAG : 0),
                                       e.bl1 + blen, 0.0));
            } else {
                out.push_back(make_nuc(e.type, new_el,
                                       BIT_BL1 | BIT_BL2
                                       | (e.flag() ? BIT_FLAG : 0),
                                       e.bl1, e.bl2 + blen));
            }
        } else {
            if (!e.has_bl1()) {
                if (blen != 0.0)
                    out.push_back(make_nuc(e.type, new_el, BIT_BL1, blen,
                                           0.0));
                else
                    out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
            } else if (!e.has_bl2()) {
                out.push_back(make_nuc(e.type, new_el, BIT_BL1,
                                       e.bl1 + blen, 0.0));
            } else {
                out.push_back(make_nuc(e.type, new_el, BIT_BL1 | BIT_BL2,
                                       e.bl1, e.bl2 + blen));
            }
        }
    } else {
        if (uer) {
            if (!e.has_bl1()) {
                if (blen != 0.0 || from_tip)
                    out.push_back(make_nuc(e.type, new_el,
                                           BIT_BL1
                                           | (from_tip ? BIT_FLAG : 0),
                                           blen, 0.0));
                else
                    out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
            } else {
                out.push_back(make_nuc(e.type, new_el,
                                       BIT_BL1 | (e.flag() ? BIT_FLAG : 0),
                                       e.bl1 + blen, 0.0));
            }
        } else {
            if (e.has_bl1())
                out.push_back(make_nuc(e.type, new_el, BIT_BL1,
                                       e.bl1 + blen, 0.0));
            else if (blen != 0.0)
                out.push_back(make_nuc(e.type, new_el, BIT_BL1, blen, 0.0));
            else
                out.push_back(make_nuc(e.type, new_el, 0, 0, 0));
        }
    }
}

// ------------------------------------------------------------ mergeVectors
// (reference :4446-4859; Python merge_vectors).  Returns 0 on success,
// -1 for the impossible 0-length merge, -2 for LK underflow.
int merge_vectors(Store &S, const Vec &v1, double bl1, bool tip1,
                  const Vec &v2, double bl2, bool tip2, bool return_lk,
                  bool is_up_down, int n_minor1, int n_minor2, Vec &out,
                  double *lk_out) {
    const bool uer = S.using_error_rate;
    double lk = 0.0;
    if (return_lk) {
        lk = (bl1 + bl2) * S.global_tot_rate;
        if (uer) {
            if (tip1 || n_minor1) lk += S.tot_error * (1 + n_minor1);
            if (tip2 || n_minor2) lk += S.tot_error * (1 + n_minor2);
        }
    }
    size_t i1 = 0, i2 = 0;
    int pos = 0;
    double tot_factor = 1.0;
    out.clear();
    const Entry *e1 = &v1[0];
    const Entry *e2 = &v2[0];
    while (true) {
        int c1 = e1->type, c2 = e2->type;
        int new_pos;
        if (c1 == TYPE_N) {
            if (c2 == TYPE_N) {
                new_pos = std::min(e1->val, e2->val);
                Entry e{};
                e.type = TYPE_N;
                e.val = new_pos;
                out.push_back(e);
            } else if (c2 < TYPE_R) {
                new_pos = pos + 1;
                emit_survivor_lower(S, out, *e2, e2->val, bl2, tip2,
                                    is_up_down);
            } else if (c2 == TYPE_R) {
                new_pos = std::min(e1->val, e2->val);
                emit_survivor_lower(S, out, *e2, new_pos, bl2, tip2,
                                    is_up_down);
            } else {  // O survives vs N
                new_pos = pos + 1;
                if (is_up_down) {
                    double tot_b = bl2 + (e2->has_bl1() ? e2->bl1 : 0.0);
                    double nv[4];
                    partial_vec_O(S, pos, tot_b, e2->probs, false, nv);
                    for (int i = 0; i < 4; i++) nv[i] *= S.root_freqs[i];
                    double s = neumaier_sum4(nv);
                    for (int i = 0; i < 4; i++) nv[i] /= s;
                    out.push_back(make_O(e2->val, false, 0.0, nv));
                } else {
                    if (e2->has_bl1())
                        out.push_back(make_O(e2->val, true, e2->bl1 + bl2,
                                             e2->probs));
                    else if (bl2 != 0.0)
                        out.push_back(make_O(e2->val, true, bl2, e2->probs));
                    else
                        out.push_back(*e2);
                }
            }
            if (return_lk) {
                lk += (bl1 + bl2)
                      * (S.cumulative_rate[pos] - S.cumulative_rate[new_pos]);
                if (uer && (tip1 || tip2)) {
                    double ce = S.site_err
                        ? (S.cumulative_error_rate[new_pos]
                           - S.cumulative_error_rate[pos])
                        : S.error_rate * (new_pos - pos);
                    if (tip1) lk += ce;
                    if (tip2) lk += ce;
                }
            }
            pos = new_pos;
        } else if (c2 == TYPE_N) {
            if (c1 < TYPE_N) {
                int32_t new_el;
                if (c1 < TYPE_R) {
                    new_pos = pos + 1;
                    new_el = e1->val;
                } else {
                    new_pos = std::min(e1->val, e2->val);
                    new_el = new_pos;
                }
                emit_survivor_upper(S, out, *e1, new_el, bl1, tip1,
                                    is_up_down);
            } else {  // O survives vs N
                new_pos = pos + 1;
                bool evolve = is_up_down
                    && ((tuple_len(S, *e1) == 4 && e1->bl1 > 0)
                        || bl1 != 0.0);
                if (evolve) {
                    double tot_b = bl1 + (e1->has_bl1() ? e1->bl1 : 0.0);
                    double nv[4];
                    partial_vec_O(S, pos, tot_b, e1->probs, true, nv);
                    double s = neumaier_sum4(nv);
                    for (int i = 0; i < 4; i++) nv[i] /= s;
                    out.push_back(make_O(e1->val, false, 0.0, nv));
                } else {
                    if (e1->has_bl1())
                        out.push_back(make_O(e1->val, true, e1->bl1 + bl1,
                                             e1->probs));
                    else if (bl1 != 0.0)
                        out.push_back(make_O(e1->val, true, bl1, e1->probs));
                    else
                        out.push_back(*e1);
                }
            }
            if (return_lk) {
                lk += (bl1 + bl2)
                      * (S.cumulative_rate[pos] - S.cumulative_rate[new_pos]);
                if (uer && (tip1 || tip2)) {
                    double ce = S.site_err
                        ? (S.cumulative_error_rate[new_pos]
                           - S.cumulative_error_rate[pos])
                        : S.error_rate * (new_pos - pos);
                    if (tip1) lk += ce;
                    if (tip2) lk += ce;
                }
            }
            pos = new_pos;
        } else {
            // both sides informative
            double tot_len1 = bl1;
            int len1 = tuple_len(S, *e1);
            if (c1 == TYPE_O) {
                if (e1->has_bl1()) tot_len1 += e1->bl1;
            } else {
                if (len1 > 2 + (uer ? 1 : 0)) {
                    tot_len1 += e1->bl1;
                    if (len1 > 3 + (uer ? 1 : 0)) tot_len1 += e1->bl2;
                }
            }
            double tot_len2 = bl2;
            int len2 = tuple_len(S, *e2);
            if (len2 > 2 + ((uer || c2 == TYPE_O) ? 1 : 0))
                tot_len2 += e2->bl1;
            bool flag1 = uer && c1 != TYPE_O
                         && ((len1 > 2 && e1->flag()) || tip1);
            bool flag2 = uer && c2 != TYPE_O
                         && ((len2 > 2 && e2->flag()) || tip2);
            if (c1 == TYPE_R && c2 == TYPE_R)
                new_pos = std::min(e1->val, e2->val);
            else
                new_pos = pos + 1;

            if (return_lk) {
                if (c1 == TYPE_R && c2 == TYPE_R) {
                    if (tot_len2 > bl2 || tot_len1 > bl1) {
                        lk += (tot_len2 - bl2 + tot_len1 - bl1)
                              * (S.cumulative_rate[new_pos]
                                 - S.cumulative_rate[pos]);
                        if (uer && ((!tip1 && flag1) || (!tip2 && flag2))) {
                            double ce = S.site_err
                                ? (S.cumulative_error_rate[pos]
                                   - S.cumulative_error_rate[new_pos])
                                : S.error_rate * (pos - new_pos);
                            if (!tip1 && flag1) lk += ce;
                            if (!tip2 && flag2) lk += ce;
                        }
                    }
                } else {
                    int ref_nuc = (c1 != TYPE_R) ? e1->val : e2->val;
                    lk -= S.mm(pos, ref_nuc, ref_nuc) * (bl2 + bl1);
                    if (uer && ((c1 != c2) || c1 == TYPE_O)
                            && (tip1 || tip2)) {
                        double ce = S.eps_at(pos);
                        if (tip1) lk += ce;
                        if (tip2) lk += ce;
                    }
                }
            }

            if (c2 == c1 && c2 < TYPE_N) {
                if (c1 == TYPE_R) {
                    Entry e{};
                    e.type = TYPE_R;
                    e.val = new_pos;
                    out.push_back(e);
                } else {
                    out.push_back(make_nuc(c1, e1->val, 0, 0, 0));
                    if (return_lk) {
                        lk += S.mm(pos, c1, c1) * (tot_len1 + tot_len2);
                        if (uer && ((!tip1 && flag1) || (!tip2 && flag2))) {
                            double ce = S.eps_at(pos);
                            if (!tip1 && flag1) lk -= ce;
                            if (!tip2 && flag2) lk -= ce;
                        }
                    }
                }
            } else if (tot_len1 == 0.0 && tot_len2 == 0.0 && c1 < TYPE_N
                       && c2 < TYPE_N && !flag1 && !flag2) {
                return -1;  // impossible merge
            } else {
                double eps = uer ? S.eps_at(pos) : S.error_rate;
                int ref_nuc, i1n;
                if (c1 == TYPE_R) {
                    ref_nuc = e2->val;
                    i1n = ref_nuc;
                } else {
                    ref_nuc = e1->val;
                    i1n = c1;
                }
                double nv[4];
                if (i1n <= 4) {
                    if (tot_len1 != 0.0 || flag1) {
                        if (is_up_down && len1 > 3 + (uer ? 1 : 0)) {
                            partial_vec_nuc(S, pos, i1n, e1->bl1, eps, flag1,
                                            false, nv);
                            for (int i = 0; i < 4; i++)
                                nv[i] *= S.root_freqs[i];
                            if (e1->bl2 + bl1 != 0.0) {
                                double tmp[4];
                                partial_vec_O(S, pos, e1->bl2 + bl1, nv,
                                              true, tmp);
                                for (int i = 0; i < 4; i++) nv[i] = tmp[i];
                            }
                        } else {
                            partial_vec_nuc(S, pos, i1n, tot_len1, eps,
                                            flag1, is_up_down, nv);
                        }
                    } else {
                        nv[0] = nv[1] = nv[2] = nv[3] = 0.0;
                        nv[i1n] = 1.0;
                    }
                } else {  // c1 is O
                    if (tot_len1 != 0.0)
                        partial_vec_O(S, pos, tot_len1, e1->probs, is_up_down,
                                      nv);
                    else
                        for (int i = 0; i < 4; i++) nv[i] = e1->probs[i];
                }
                int i2n = (c2 == TYPE_R) ? ref_nuc : c2;
                double nv2[4];
                if (i2n == TYPE_O) {
                    if (tot_len2 != 0.0)
                        partial_vec_O(S, pos, tot_len2, e2->probs, false,
                                      nv2);
                    else
                        for (int i = 0; i < 4; i++) nv2[i] = e2->probs[i];
                } else {
                    if (tot_len2 != 0.0 || flag2) {
                        partial_vec_nuc(S, pos, i2n, tot_len2, eps, flag2,
                                        false, nv2);
                    } else {
                        nv2[0] = nv2[1] = nv2[2] = nv2[3] = 0.0;
                        nv2[i2n] = 1.0;
                    }
                }
                for (int i = 0; i < 4; i++) nv[i] *= nv2[i];
                double s = neumaier_sum4(nv);
                if (s == 0.0) {
                    return return_lk ? -2 : -1;
                }
                for (int i = 0; i < 4; i++) nv[i] /= s;
                int state = simplify4(S, nv, ref_nuc);
                if (state < 0) return -3;
                if (state == TYPE_O)
                    out.push_back(make_O(ref_nuc, false, 0.0, nv));
                else if (state == TYPE_R) {
                    Entry e{};
                    e.type = TYPE_R;
                    e.val = new_pos;
                    out.push_back(e);
                } else
                    out.push_back(make_nuc(state, ref_nuc, 0, 0, 0));
                if (return_lk) tot_factor *= s;
            }
            pos = new_pos;
        }

        if (return_lk && tot_factor <= S.min_carry) {
            if (tot_factor < DBL_MIN_POS) return -2;
            lk += std::log(tot_factor);
            tot_factor = 1.0;
        }
        if (pos == S.lRef) break;
        if (c1 < TYPE_R || c1 == TYPE_O) e1 = &v1[++i1];
        else if (pos == e1->val) e1 = &v1[++i1];
        if (c2 < TYPE_R || c2 == TYPE_O) e2 = &v2[++i2];
        else if (pos == e2->val) e2 = &v2[++i2];
    }
    if (return_lk) *lk_out = lk + std::log(tot_factor);
    return 0;
}

// --------------------------------------------------------- appendProbNode
// (reference :6505-6785; Python append_prob_node)
double append_prob_node(const Store &S, const Vec &vP, const Vec &vC,
                        bool tip_c, double blen) {
    const bool uer = S.using_error_rate;
    const int uer1 = uer ? 1 : 0;
    size_t i1 = 0, i2 = 0;
    double tot_factor = 1.0;
    int pos = 0;
    const Entry *e1 = &vP[0];
    const Entry *e2 = &vC[0];
    double lk = blen * S.global_tot_rate;
    if (uer && tip_c) lk += S.tot_error;
    const double NEG_INF = -std::numeric_limits<double>::infinity();
    while (true) {
        int c1 = e1->type, c2 = e2->type;
        if (c2 == TYPE_N) {
            if (c1 == TYPE_R || c1 == TYPE_N) {
                pos = std::min(e1->val, e2->val);
                if (pos == S.lRef) break;
                if (e1->val == pos) e1 = &vP[++i1];
            } else {
                pos += 1;
                if (pos == S.lRef) break;
                e1 = &vP[++i1];
            }
            if (e2->val == pos) e2 = &vC[++i2];
        } else if (c1 == TYPE_N) {
            if (c2 == TYPE_R) {
                pos = std::min(e1->val, e2->val);
                if (pos == S.lRef) break;
                if (e2->val == pos) e2 = &vC[++i2];
            } else {
                pos += 1;
                if (pos == S.lRef) break;
                e2 = &vC[++i2];
            }
            if (e1->val == pos) e1 = &vP[++i1];
        } else {
            double contrib = blen;
            int len1 = tuple_len(S, *e1);
            int len2 = tuple_len(S, *e2);
            if (c1 != c2 || c1 == TYPE_O) {
                if (c1 < TYPE_N) {
                    if (len1 == 3 + uer1) contrib += e1->bl1;
                    else if (len1 == 4 + uer1) contrib += e1->bl2;
                } else if (len1 == 4) {
                    contrib += e1->bl1;
                }
                if (c2 < TYPE_N) {
                    if (len2 == 3 + uer1) contrib += e2->bl1;
                } else if (len2 == 4) {
                    contrib += e2->bl1;
                }
            }

            if (c1 == TYPE_R) {
                if (c2 == TYPE_R) {
                    pos = std::min(e1->val, e2->val);
                    if (pos == S.lRef) break;
                    if (e2->val == pos) e2 = &vC[++i2];
                } else if (c2 == TYPE_O) {
                    int i1n = e2->val;
                    if (e2->probs[i1n] > 0.02) {
                        tot_factor *= e2->probs[i1n];
                    } else if (len1 == 4 + uer1) {
                        bool flag1 = uer && len1 > 2 && e1->flag();
                        double eps = uer ? S.eps_at(pos) : S.error_rate;
                        double t3[4], t2[4];
                        partial_vec_O(S, pos, contrib, e2->probs, false, t3);
                        partial_vec_nuc(S, pos, i1n, e1->bl1, eps, flag1,
                                        false, t2);
                        double tot = 0.0;
                        for (int i = 0; i < 4; i++)
                            tot += t3[i] * t2[i] * S.root_freqs[i];
                        tot /= S.root_freqs[i1n];
                        tot_factor *= tot;
                    } else {
                        if (contrib != 0.0) {
                            double t3[4];
                            partial_vec_O(S, pos, contrib, e2->probs, false,
                                          t3);
                            tot_factor *= t3[i1n];
                        } else {
                            tot_factor *= e2->probs[i1n];
                        }
                    }
                    pos += 1;
                    if (pos == S.lRef) break;
                    e2 = &vC[++i2];
                } else {
                    bool flag2 = uer && (tip_c || (len2 > 2 && e2->flag()));
                    if (len1 == 4 + uer1) {
                        bool flag1 = uer && len1 > 2 && e1->flag();
                        int i1n = e2->val;
                        int i2n = c2;
                        double eps = uer ? S.eps_at(pos) : S.error_rate;
                        double t3[4], t2[4];
                        partial_vec_nuc(S, pos, i2n, contrib, eps, flag2,
                                        false, t3);
                        partial_vec_nuc(S, pos, i1n, e1->bl1, eps, flag1,
                                        false, t2);
                        double tot = 0.0;
                        for (int i = 0; i < 4; i++)
                            tot += t3[i] * t2[i] * S.root_freqs[i];
                        tot_factor *= tot / S.root_freqs[i1n];
                    } else if (flag2) {
                        double eps = uer ? S.eps_at(pos) : S.error_rate;
                        tot_factor *= std::min(
                            0.25, S.mm(pos, e2->val, c2) * contrib)
                            + eps * 0.33333;
                    } else if (contrib != 0.0) {
                        tot_factor *= std::min(
                            0.25, S.mm(pos, e2->val, c2) * contrib);
                    } else {
                        return NEG_INF;
                    }
                    pos += 1;
                    if (pos == S.lRef) break;
                    e2 = &vC[++i2];
                }
                if (e1->val == pos) e1 = &vP[++i1];
            } else if (c1 == TYPE_O) {
                if (c2 == TYPE_O) {
                    double tot = 0.0;
                    if (contrib != 0.0) {
                        double t3[4];
                        partial_vec_O(S, pos, contrib, e2->probs, false, t3);
                        for (int j = 0; j < 4; j++)
                            tot += e1->probs[j] * t3[j];
                    } else {
                        for (int j = 0; j < 4; j++)
                            tot += e1->probs[j] * e2->probs[j];
                    }
                    tot_factor *= tot;
                } else {
                    int i2n = (c2 == TYPE_R) ? e1->val : c2;
                    if (e1->probs[i2n] > 0.02) {
                        tot_factor *= e1->probs[i2n];
                    } else {
                        double t3[4];
                        if (uer && (tip_c || (len2 > 2 && e2->flag()))) {
                            double eps = S.eps_at(pos);
                            partial_vec_nuc(S, pos, i2n, contrib, eps, true,
                                            false, t3);
                        } else {
                            partial_vec_nuc(S, pos, i2n, contrib, 0.0, false,
                                            false, t3);
                        }
                        double tot = 0.0;
                        for (int j = 0; j < 4; j++)
                            tot += e1->probs[j] * t3[j];
                        tot_factor *= tot;
                    }
                }
                pos += 1;
                if (pos == S.lRef) break;
                e1 = &vP[++i1];
                if (c2 != TYPE_R || e2->val == pos) e2 = &vC[++i2];
            } else {
                // parent is a concrete non-reference nucleotide
                if (c2 != c1) {
                    bool flag1 = uer && len1 > 2 && e1->flag();
                    int i1n = c1;
                    if (c2 < TYPE_N) {
                        int i2n = (c2 == TYPE_R) ? e1->val : c2;
                        bool flag2 = uer
                            && (tip_c || (len2 > 2 && e2->flag()));
                        if (len1 == 4 + uer1) {
                            double eps = uer ? S.eps_at(pos) : S.error_rate;
                            double t3[4], t2[4];
                            partial_vec_nuc(S, pos, i2n, contrib, eps, flag2,
                                            false, t3);
                            partial_vec_nuc(S, pos, i1n, e1->bl1, eps, flag1,
                                            false, t2);
                            double tot = 0.0;
                            for (int j = 0; j < 4; j++)
                                tot += S.root_freqs[j] * t3[j] * t2[j];
                            tot_factor *= tot / S.root_freqs[i1n];
                        } else if (flag1 || flag2) {
                            double eps = uer ? S.eps_at(pos) : S.error_rate;
                            tot_factor *= std::min(
                                0.25, S.mm(pos, i1n, i2n) * contrib)
                                + ((flag1 ? 1 : 0) + (flag2 ? 1 : 0))
                                  * 0.33333 * eps;
                        } else if (contrib != 0.0) {
                            tot_factor *= std::min(
                                0.25, S.mm(pos, i1n, i2n) * contrib);
                        } else {
                            return NEG_INF;
                        }
                    } else {
                        // child is O
                        double eps = uer ? S.eps_at(pos) : S.error_rate;
                        if (e2->probs[i1n] > 0.02) {
                            tot_factor *= e2->probs[i1n];
                        } else if (len1 == 4 + uer1) {
                            double t2[4], t3[4];
                            partial_vec_nuc(S, pos, i1n, e1->bl1, eps, flag1,
                                            false, t2);
                            partial_vec_O(S, pos, contrib, e2->probs, false,
                                          t3);
                            double tot = 0.0;
                            for (int i = 0; i < 4; i++)
                                tot += t2[i] * t3[i] * S.root_freqs[i];
                            tot_factor *= tot / S.root_freqs[i1n];
                        } else if (contrib != 0.0) {
                            double t3[4];
                            partial_vec_O(S, pos, contrib, e2->probs, false,
                                          t3);
                            tot_factor *= t3[i1n];
                        } else {
                            tot_factor *= e2->probs[i1n];
                        }
                    }
                }
                pos += 1;
                if (pos == S.lRef) break;
                e1 = &vP[++i1];
                if (c2 != TYPE_R || e2->val == pos) e2 = &vC[++i2];
            }
        }
        if (tot_factor <= S.min_carry) {
            if (tot_factor < DBL_MIN_POS) return NEG_INF;
            lk += std::log(tot_factor);
            tot_factor = 1.0;
        }
    }
    return lk + std::log(tot_factor);
}


// ------------------------------------------- estimateBranchLengthWithDerivative
// (reference :5040-5358; Python estimate_branch_length).  Returns -1.0 for
// the Python-side `False` ("optimal length is 0").
double estimate_branch_length(const Store &S, const Vec &vP, const Vec &vC,
                              bool from_tip_c) {
    const bool uer = S.using_error_rate;
    const int uer1 = uer ? 1 : 0;
    double c1acc = S.global_tot_rate;
    std::vector<double> ais;
    ais.reserve(64);
    int n_zeros = 0;
    size_t i1 = 0, i2 = 0;
    int pos = 0;
    const Entry *e1 = &vP[0];
    const Entry *e2 = &vC[0];
    while (true) {
        int t1 = e1->type, t2 = e2->type;
        if (t2 == TYPE_N) {
            int end = (t1 == TYPE_R || t1 == TYPE_N)
                ? std::min(e1->val, e2->val) : pos + 1;
            c1acc += S.cumulative_rate[pos] - S.cumulative_rate[end];
            pos = end;
        } else if (t1 == TYPE_N) {
            int end = (t2 == TYPE_R) ? std::min(e1->val, e2->val) : pos + 1;
            c1acc += S.cumulative_rate[pos] - S.cumulative_rate[end];
            pos = end;
        } else {
            if (t1 == TYPE_R && t2 == TYPE_R) {
                pos = std::min(e1->val, e2->val);
            } else {
                int len1 = tuple_len(S, *e1), len2 = tuple_len(S, *e2);
                if (t1 == TYPE_R)
                    c1acc -= S.mm(pos, e2->val, e2->val);
                else
                    c1acc -= S.mm(pos, e1->val, e1->val);
                bool flag1 = uer && t1 != TYPE_O && len1 > 2 && e1->flag();
                bool flag2 = uer && t2 != TYPE_O
                             && (from_tip_c || (len2 > 2 && e2->flag()));
                double eps = uer ? S.eps_at(pos) : S.error_rate;
                // contrib starts as Python `False` == 0.0 (+ keeps += sem.)
                double contrib = 0.0;
                if (t1 < TYPE_N) {
                    if (len1 == 3 + uer1) contrib = e1->bl1;
                    else if (len1 == 4 + uer1) contrib = e1->bl2;
                } else if (len1 > 3) {
                    contrib = e1->bl1;
                }
                if (t2 < TYPE_N) {
                    if (len2 > 2 + uer1) contrib += e2->bl1;
                } else if (len2 > 3) {
                    contrib += e2->bl1;
                }

                if (t1 == TYPE_R) {
                    if (t2 == TYPE_O) {
                        int i1n = e2->val;
                        double coeff0, coeff1 = 0.0;
                        if (len1 == 4 + uer1) {
                            coeff0 = S.root_freqs[i1n] * e2->probs[i1n];
                            for (int i = 0; i < 4; i++) {
                                coeff0 += S.root_freqs[i] * S.mm(pos, i, i1n)
                                          * e1->bl1 * e2->probs[i];
                                coeff1 += S.mm(pos, i1n, i) * e2->probs[i];
                            }
                            coeff1 *= S.root_freqs[i1n];
                            if (contrib != 0.0) coeff0 += coeff1 * contrib;
                            if (flag1) {
                                coeff0 -= 1.33333 * eps * S.root_freqs[i1n]
                                          * e2->probs[i1n];
                                for (int i = 0; i < 4; i++)
                                    coeff0 += S.root_freqs[i] * e2->probs[i]
                                              * 0.33333 * eps;
                            }
                        } else {
                            coeff0 = e2->probs[i1n];
                            for (int j = 0; j < 4; j++)
                                coeff1 += S.mm(pos, i1n, j) * e2->probs[j];
                            if (contrib != 0.0) coeff0 += coeff1 * contrib;
                        }
                        if (coeff1 < 0.0) c1acc += coeff1 / coeff0;
                        else if (coeff1 != 0.0) ais.push_back(coeff0 / coeff1);
                        pos += 1;
                    } else {
                        // R parent vs different concrete child
                        bool have = true;
                        double coeff0;
                        if (len1 == 4 + uer1) {
                            int i1n = e2->val, i2n = t2;
                            coeff0 = S.root_freqs[i2n] * S.mm(pos, i2n, i1n)
                                     * e1->bl1;
                            if (contrib != 0.0)
                                coeff0 += S.root_freqs[i1n]
                                          * S.mm(pos, i1n, i2n) * contrib;
                            if (flag2)
                                coeff0 += S.root_freqs[i1n] * 0.33333 * eps;
                            if (flag1)
                                coeff0 += S.root_freqs[i2n] * 0.33333 * eps;
                            double coeff1 = S.root_freqs[i1n]
                                            * S.mm(pos, i1n, i2n);
                            if (coeff1 != 0.0) coeff0 = coeff0 / coeff1;
                            else have = false;
                        } else {
                            coeff0 = contrib;
                            if (flag2) {
                                double m = S.mm(pos, e2->val, t2);
                                if (m != 0.0) coeff0 += eps * 0.33333 / m;
                                else have = false;
                            }
                        }
                        if (have) {
                            if (coeff0 != 0.0) ais.push_back(coeff0);
                            else n_zeros += 1;
                        }
                        pos += 1;
                    }
                } else if (t1 == TYPE_O) {
                    double coeff0, coeff1 = 0.0;
                    if (t2 == TYPE_O) {
                        coeff0 = e1->probs[0] * e2->probs[0]
                                 + e1->probs[1] * e2->probs[1]
                                 + e1->probs[2] * e2->probs[2]
                                 + e1->probs[3] * e2->probs[3];
                        for (int i = 0; i < 4; i++)
                            for (int j = 0; j < 4; j++)
                                coeff1 += e1->probs[i] * e2->probs[j]
                                          * S.mm(pos, i, j);
                        if (contrib != 0.0) coeff0 += coeff1 * contrib;
                    } else {
                        int i2n = (t2 == TYPE_R) ? e1->val : t2;
                        coeff0 = e1->probs[i2n];
                        for (int i = 0; i < 4; i++)
                            coeff1 += e1->probs[i] * S.mm(pos, i, i2n);
                        if (contrib != 0.0) coeff0 += coeff1 * contrib;
                        if (flag2) coeff0 += eps * 0.33333;
                    }
                    if (coeff1 < 0.0) c1acc += coeff1 / coeff0;
                    else if (coeff1 != 0.0) ais.push_back(coeff0 / coeff1);
                    pos += 1;
                } else {
                    if (t2 == t1) {
                        c1acc += S.mm(pos, t1, t1);
                    } else {
                        int i1n = t1;
                        if (t2 < TYPE_N) {
                            int i2n = (t2 == TYPE_R) ? e1->val : t2;
                            bool have = true;
                            double coeff0;
                            if (len1 == 4 + uer1) {
                                coeff0 = S.root_freqs[i2n]
                                         * S.mm(pos, i2n, i1n) * e1->bl1;
                                if (contrib != 0.0)
                                    coeff0 += S.root_freqs[i1n]
                                              * S.mm(pos, i1n, i2n)
                                              * contrib;
                                if (flag2)
                                    coeff0 += S.root_freqs[i1n] * 0.33333
                                              * eps;
                                if (flag1)
                                    coeff0 += S.root_freqs[i2n] * 0.33333
                                              * eps;
                                double coeff1 = S.root_freqs[i1n]
                                                * S.mm(pos, i1n, i2n);
                                if (coeff1 != 0.0) coeff0 = coeff0 / coeff1;
                                else have = false;
                            } else {
                                coeff0 = contrib;
                                if (flag2)
                                    coeff0 += eps * 0.33333
                                              / S.mm(pos, i1n, i2n);
                            }
                            if (have) {
                                if (coeff0 != 0.0) ais.push_back(coeff0);
                                else n_zeros += 1;
                            }
                        } else {
                            // child is O
                            double coeff0, coeff1 = 0.0;
                            if (len1 == 4 + uer1) {
                                coeff0 = S.root_freqs[i1n] * e2->probs[i1n];
                                for (int i = 0; i < 4; i++) {
                                    coeff0 += S.root_freqs[i]
                                              * S.mm(pos, i, i1n) * e1->bl1
                                              * e2->probs[i];
                                    coeff1 += S.mm(pos, i1n, i)
                                              * e2->probs[i];
                                }
                                coeff1 *= S.root_freqs[i1n];
                                if (contrib != 0.0)
                                    coeff0 += coeff1 * contrib;
                                if (flag1) {
                                    coeff0 -= 1.33333 * eps
                                              * S.root_freqs[i1n]
                                              * e2->probs[i1n];
                                    for (int i = 0; i < 4; i++)
                                        coeff0 += S.root_freqs[i]
                                                  * e2->probs[i] * 0.33333
                                                  * eps;
                                }
                            } else {
                                coeff0 = e2->probs[i1n];
                                for (int j = 0; j < 4; j++)
                                    coeff1 += S.mm(pos, i1n, j)
                                              * e2->probs[j];
                                if (contrib != 0.0)
                                    coeff0 += coeff1 * contrib;
                            }
                            if (coeff1 < 0.0) c1acc += coeff1 / coeff0;
                            else if (coeff1 != 0.0)
                                ais.push_back(coeff0 / coeff1);
                        }
                    }
                    pos += 1;
                }
            }
        }
        if (pos == S.lRef) break;
        if (t1 < TYPE_R || t1 == TYPE_O) e1 = &vP[++i1];
        else if (pos == e1->val) e1 = &vP[++i1];
        if (t2 < TYPE_R || t2 == TYPE_O) e2 = &vC[++i2];
        else if (pos == e2->val) e2 = &vC[++i2];
    }
    // bisection on the derivative (reference :5297-5358)
    double c1 = -c1acc;
    size_t n = ais.size() + n_zeros;
    if (n == 0) return -1.0;
    double min_ais = ais.empty() ? 0.0
        : *std::min_element(ais.begin(), ais.end());
    if (n_zeros) min_ais = std::min(0.0, min_ais);
    if (min_ais < 0.0) return 0.1;
    double t_down = std::min(0.1, (double)n / c1 - min_ais);
    if (t_down <= 0.0) return -1.0;
    double v_down = n_zeros ? n_zeros / t_down : 0.0;
    for (double ai : ais) v_down += 1.0 / (ai + t_down);
    double max_ais = ais.empty() ? 0.0
        : *std::max_element(ais.begin(), ais.end());
    double t_up = std::min(0.1, (double)n / c1 - max_ais);
    if (t_up >= 0.1) return 0.1;
    double sens = S.min_blen_sensitivity;
    if (t_up <= sens) t_up = (min_ais != 0.0) ? 0.0 : sens;
    double v_up = n_zeros ? n_zeros / t_up : 0.0;
    for (double ai : ais) v_up += 1.0 / (ai + t_up);
    if (v_down > c1 + sens || v_up < c1 - sens) {
        if (v_up < c1 - sens && t_up == 0.0) return -1.0;
        if (v_down > c1 + sens && t_down >= 0.1) return 0.1;
    }
    while (t_down - t_up > sens) {
        double t_mid = (t_up + t_down) / 2;
        double v_mid = n_zeros ? n_zeros / t_mid : 0.0;
        for (double ai : ais) v_mid += 1.0 / (ai + t_mid);
        if (v_mid > c1) t_up = t_mid;
        else t_down = t_mid;
    }
    return t_up;
}

// ---------------------------------------------- passGenomeListThroughBranch
// (reference :3749-3877; Python pass_through_branch)
void pass_through_branch(const Store &S, const Vec &v,
                         const int32_t *muts, int n_mut, bool dir_is_up,
                         Vec &out) {
    int i_mut = 0;
    size_t i_ent = 0;
    int last_pos = 0;
    out.clear();
    const Entry *e = &v[0];
    while (true) {
        int c = e->type;
        if (c == TYPE_N) {
            out.push_back(*e);
            last_pos = e->val;
            if (last_pos == S.lRef) break;
            while (i_mut < n_mut && muts[i_mut * 3] <= last_pos) i_mut++;
            e = &v[++i_ent];
        } else if (c < TYPE_R) {
            last_pos += 1;
            if (i_mut < n_mut && muts[i_mut * 3] <= last_pos) {
                int other = dir_is_up ? muts[i_mut * 3 + 1]
                                      : muts[i_mut * 3 + 2];
                Entry ne = *e;
                if (c == other) {
                    ne.type = TYPE_R;
                    ne.val = last_pos;
                } else {
                    ne.val = other;
                }
                out.push_back(ne);
                i_mut++;
            } else {
                out.push_back(*e);
            }
            if (last_pos == S.lRef) break;
            e = &v[++i_ent];
        } else if (c == TYPE_R) {
            while (i_mut < n_mut && muts[i_mut * 3] <= e->val) {
                int mpos = muts[i_mut * 3];
                if (mpos > last_pos + 1) {
                    Entry ne = *e;
                    ne.val = mpos - 1;
                    out.push_back(ne);
                }
                last_pos = mpos;
                int nuc, other;
                if (dir_is_up) {
                    nuc = muts[i_mut * 3 + 2];
                    other = muts[i_mut * 3 + 1];
                } else {
                    nuc = muts[i_mut * 3 + 1];
                    other = muts[i_mut * 3 + 2];
                }
                Entry ne = *e;
                ne.type = (int8_t)nuc;
                ne.val = other;
                out.push_back(ne);
                i_mut++;
            }
            if (last_pos < e->val) {
                last_pos = e->val;
                out.push_back(*e);
            }
            if (last_pos == S.lRef) break;
            e = &v[++i_ent];
        } else {  // O
            last_pos += 1;
            if (i_mut < n_mut && muts[i_mut * 3] <= last_pos) {
                int other = dir_is_up ? muts[i_mut * 3 + 1]
                                      : muts[i_mut * 3 + 2];
                Entry ne = *e;
                ne.val = other;
                out.push_back(ne);
                i_mut++;
            } else {
                out.push_back(*e);
            }
            if (last_pos == S.lRef) break;
            e = &v[++i_ent];
        }
    }
}

// ------------------------------------------------------- rootVector (frame)
// (reference :4916-4996 minus the MAT walk; Python root_vector_frame)
void root_vector_frame(const Store &S, const Vec &v, double blen,
                       bool is_from_tip, Vec &out) {
    const bool uer = S.using_error_rate;
    out.clear();
    int new_pos = 0;
    for (const Entry &e : v) {
        int c = e.type;
        if (c == TYPE_N) {
            out.push_back(e);
            new_pos = e.val;
        } else if (c == TYPE_O) {
            double tot_b = blen + (e.has_bl1() ? e.bl1 : 0.0);
            double nv[4];
            if (tot_b != 0.0) {
                partial_vec_O(S, new_pos, tot_b, e.probs, false, nv);
                for (int i = 0; i < 4; i++) nv[i] *= S.root_freqs[i];
            } else {
                for (int i = 0; i < 4; i++)
                    nv[i] = e.probs[i] * S.root_freqs[i];
            }
            double sum = neumaier_sum4(nv);
            for (int i = 0; i < 4; i++) nv[i] /= sum;
            out.push_back(make_O(e.val, false, 0.0, nv));
            new_pos += 1;
        } else {
            if (uer) {
                bool fl = (tuple_len(S, e) > 2 && e.flag()) || is_from_tip;
                if (tuple_len(S, e) > 3)
                    out.push_back(make_nuc(c, e.val,
                                           BIT_BL1 | BIT_BL2
                                           | (fl ? BIT_FLAG : 0),
                                           e.bl1 + blen, 0.0));
                else if (blen != 0.0 || fl)
                    out.push_back(make_nuc(c, e.val,
                                           BIT_BL1 | BIT_BL2
                                           | (fl ? BIT_FLAG : 0),
                                           blen, 0.0));
                else
                    out.push_back(make_nuc(c, e.val, 0, 0, 0));
            } else {
                if (tuple_len(S, e) == 3)
                    out.push_back(make_nuc(c, e.val, BIT_BL1 | BIT_BL2,
                                           e.bl1 + blen, 0.0));
                else if (blen != 0.0)
                    out.push_back(make_nuc(c, e.val, BIT_BL1 | BIT_BL2,
                                           blen, 0.0));
                else
                    out.push_back(make_nuc(c, e.val, 0, 0, 0));
            }
            new_pos = (c == TYPE_R) ? e.val : new_pos + 1;
        }
    }
}

// ------------------------------------------------------ findProbRoot (frame)
// (reference :4865-4912; Python find_prob_root_frame)
double find_prob_root_frame(const Store &S, const Vec &v) {
    const bool uer = S.using_error_rate;
    double log_lk = 0.0, log_factor = 1.0;
    int pos = 0;
    for (const Entry &e : v) {
        int c = e.type;
        if (uer && c < TYPE_N && tuple_len(S, e) > 2 && e.flag()) {
            if (c == TYPE_R) {
                log_lk += S.rfle_cum[e.val] - S.rfle_cum[pos];
                pos = e.val;
            } else {
                double eps = S.eps_at(pos);
                log_factor *= S.root_freqs[c] * (1.0 - 1.33333 * eps)
                              + 0.33333 * eps;
                pos += 1;
            }
        } else {
            if (c == TYPE_R) {
                for (int i = 0; i < 4; i++)
                    log_lk += S.root_freqs_log[i]
                              * (S.cumulative_bases[e.val * 4 + i]
                                 - S.cumulative_bases[pos * 4 + i]);
                pos = e.val;
            } else if (c < TYPE_R) {
                log_lk += S.root_freqs_log[c];
                pos += 1;
            } else if (c == TYPE_O) {
                double tot = S.root_freqs[0] * e.probs[0]
                             + S.root_freqs[1] * e.probs[1]
                             + S.root_freqs[2] * e.probs[2]
                             + S.root_freqs[3] * e.probs[3];
                log_factor *= tot;
                pos += 1;
            } else {
                pos = e.val;
            }
        }
        if (log_factor <= S.min_carry) {
            if (log_factor < DBL_MIN_POS)
                return -std::numeric_limits<double>::infinity();
            log_lk += std::log(log_factor);
            log_factor = 1.0;
        }
    }
    return log_lk + std::log(log_factor);
}

// --------------------------------------------------- areVectorsDifferent
// (reference :5419-5472)
bool are_vectors_different(const Store &S, const Vec &v1, const Vec &v2) {
    size_t i1 = 0, i2 = 0;
    int pos = 0;
    const Entry *e1 = &v1[0];
    const Entry *e2 = &v2[0];
    const double tp = S.threshold_prob;
    while (true) {
        if (e1->type != e2->type) return true;
        if (tuple_len(S, *e1) != tuple_len(S, *e2)) return true;
        int c = e1->type;
        if (c < TYPE_N) {
            if (e1->has_bl1()) {
                if (std::fabs(e1->bl1 - e2->bl1) > tp) return true;
                if (e1->has_bl2()) {
                    if (std::fabs(e1->bl2 - e2->bl2) > tp) return true;
                    if (S.using_error_rate
                            && std::fabs((double)(e1->flag() ? 1 : 0)
                                         - (double)(e2->flag() ? 1 : 0))
                               > tp)
                        return true;
                } else if (S.using_error_rate
                           && std::fabs((double)(e1->flag() ? 1 : 0)
                                        - (double)(e2->flag() ? 1 : 0))
                              > tp) {
                    return true;
                }
            }
            pos = (c < TYPE_R) ? pos + 1 : std::min(e1->val, e2->val);
        } else if (c == TYPE_O) {
            if (tuple_len(S, *e1) == 4
                    && std::fabs(e1->bl1 - e2->bl1) > tp)
                return true;
            for (int i = 0; i < 4; i++) {
                double d = std::fabs(e1->probs[i] - e2->probs[i]);
                if (d != 0.0) {
                    if (e1->probs[i] == 0.0 || e2->probs[i] == 0.0)
                        return true;
                    if (d > S.threshold_diff_update
                            || (d > tp
                                && (d / e1->probs[i]
                                        > S.threshold_fold_change
                                    || d / e2->probs[i]
                                        > S.threshold_fold_change)))
                        return true;
                }
            }
            pos += 1;
        } else {
            pos = std::min(e1->val, e2->val);
        }
        if (pos == S.lRef) break;
        if (e1->type < TYPE_R || e1->type == TYPE_O) e1 = &v1[++i1];
        else if (pos == e1->val) e1 = &v1[++i1];
        if (e2->type < TYPE_R || e2->type == TYPE_O) e2 = &v2[++i2];
        else if (pos == e2->val) e2 = &v2[++i2];
    }
    return false;
}

// ------------------------------------------------------- isMinorSequence
// (reference :5919-6004)
int is_minor_sequence(const Store &S, const Vec &v1, const Vec &v2,
                      bool only_identical) {
    size_t i1 = 0, i2 = 0;
    int pos = 0;
    const Entry *e1 = &v1[0];
    const Entry *e2 = &v2[0];
    bool found1 = false, found2 = false;
    while (true) {
        int c1 = e1->type, c2 = e2->type;
        if (c1 != c2) {
            if (only_identical) return 0;
            if (c1 == TYPE_N) {
                pos = (c2 == TYPE_R) ? std::min(e1->val, e2->val) : pos + 1;
                found2 = true;
            } else if (c2 == TYPE_N) {
                pos = (c1 == TYPE_R) ? std::min(e1->val, e2->val) : pos + 1;
                found1 = true;
            } else if (c1 == TYPE_O) {
                int i2n = (c2 == TYPE_R) ? e1->val : c2;
                if (e1->probs[i2n] > 0.1) found2 = true;
                else return 0;
                pos += 1;
            } else if (c2 == TYPE_O) {
                int i1n = (c1 == TYPE_R) ? e2->val : c1;
                if (e2->probs[i1n] > 0.1) found1 = true;
                else return 0;
                pos += 1;
            } else {
                return 0;
            }
        } else if (c1 == TYPE_O) {
            for (int j = 0; j < 4; j++) {
                if (only_identical) {
                    if (e2->probs[j] != e1->probs[j]) return 0;
                } else if (e2->probs[j] > 0.1 && e1->probs[j] < 0.1) {
                    found1 = true;
                } else if (e1->probs[j] > 0.1 && e2->probs[j] < 0.1) {
                    found2 = true;
                }
            }
            pos += 1;
        } else {
            pos = (c1 < TYPE_R) ? pos + 1 : std::min(e1->val, e2->val);
        }
        if (found1 && found2) return 0;
        if (pos == S.lRef) break;
        if (e1->type < TYPE_R || e1->type == TYPE_O) e1 = &v1[++i1];
        else if (pos == e1->val) e1 = &v1[++i1];
        if (e2->type < TYPE_R || e2->type == TYPE_O) e2 = &v2[++i2];
        else if (pos == e2->val) e2 = &v2[++i2];
    }
    if (found1) return found2 ? 0 : 1;
    return found2 ? 2 : 1;
}

// ----------------------------------------------------- updatePesudoCounts
// (reference :5002-5035)
void update_pseudo_counts(const Store &S, const Vec &v1, const Vec &v2,
                          double *counts /*16*/) {
    size_t i1 = 0, i2 = 0;
    int pos = 0;
    const Entry *e1 = &v1[0];
    const Entry *e2 = &v2[0];
    while (true) {
        int c1 = e1->type, c2 = e2->type;
        if (c1 != c2 && c1 < TYPE_N && c2 < TYPE_N) {
            if (c1 == TYPE_R) counts[e2->val * 4 + c2] += 1;
            else if (c2 == TYPE_R) counts[c1 * 4 + e1->val] += 1;
            else counts[c1 * 4 + c2] += 1;
            pos += 1;
        } else {
            if ((c1 == TYPE_R || c1 == TYPE_N)
                    && (c2 == TYPE_R || c2 == TYPE_N))
                pos = std::min(e1->val, e2->val);
            else
                pos += 1;
        }
        if (pos == S.lRef) break;
        if (e1->type < TYPE_R || e1->type == TYPE_O) e1 = &v1[++i1];
        else if (pos == e1->val) e1 = &v1[++i1];
        if (e2->type < TYPE_R || e2->type == TYPE_O) e2 = &v2[++i2];
        else if (pos == e2->val) e2 = &v2[++i2];
    }
}

}  // namespace

// ================================================================ C API
extern "C" {

Store *store_create(int lRef) {
    Store *s = new Store();
    s->lRef = lRef;
    s->global_tot_rate = -(double)lRef;
    return s;
}

void store_free(Store *s) { delete s; }

void store_set_ref(Store *s, const int8_t *ref_indices,
                   const double *root_freqs, const int32_t *cum_bases) {
    s->ref_indices.assign(ref_indices, ref_indices + s->lRef);
    for (int i = 0; i < 4; i++) {
        s->root_freqs[i] = root_freqs[i];
        s->root_freqs_log[i] = std::log(root_freqs[i]);
    }
    s->cumulative_bases.assign(cum_bases, cum_bases + (s->lRef + 1) * 4);
}

void store_set_params(Store *s, double threshold_prob, double min_carry,
                      double min_blen_sensitivity,
                      double threshold_diff_update,
                      double threshold_fold_change) {
    s->threshold_prob = threshold_prob;
    s->threshold_prob4 = threshold_prob * threshold_prob * threshold_prob
                         * threshold_prob;
    s->min_carry = min_carry;
    s->min_blen_sensitivity = min_blen_sensitivity;
    s->threshold_diff_update = threshold_diff_update;
    s->threshold_fold_change = threshold_fold_change;
}

void store_set_model(Store *s, const double *mut, const double *cum_rate,
                     int use_rate_variation, const double *site_rates,
                     int using_error_rate, int site_err, double error_rate,
                     const double *error_rates,
                     const double *cumulative_error_rate, double tot_error,
                     const double *rfle_cum) {
    for (int i = 0; i < 4; i++)
        for (int j = 0; j < 4; j++) s->mut[i][j] = mut[i * 4 + j];
    s->cumulative_rate.assign(cum_rate, cum_rate + s->lRef + 1);
    s->use_rate_variation = use_rate_variation != 0;
    if (use_rate_variation && site_rates)
        s->site_rates.assign(site_rates, site_rates + s->lRef);
    s->using_error_rate = using_error_rate != 0;
    s->site_err = site_err != 0;
    s->error_rate = error_rate;
    if (error_rates)
        s->error_rates.assign(error_rates, error_rates + s->lRef);
    if (cumulative_error_rate)
        s->cumulative_error_rate.assign(cumulative_error_rate,
                                        cumulative_error_rate + s->lRef + 1);
    s->tot_error = tot_error;
    if (rfle_cum) s->rfle_cum.assign(rfle_cum, rfle_cum + s->lRef + 1);
}

int64_t vec_create(Store *s, int n, const int8_t *types,
                   const int32_t *vals, const double *bl1,
                   const double *bl2, const uint8_t *bits,
                   const double *probs) {
    int64_t id = s->alloc();
    Vec &v = s->v(id);
    v.resize(n);
    for (int k = 0; k < n; k++) {
        v[k].type = types[k];
        v[k].val = vals[k];
        v[k].bits = bits[k];
        v[k].bl1 = bl1[k];
        v[k].bl2 = bl2[k];
        for (int i = 0; i < 4; i++) v[k].probs[i] = probs[k * 4 + i];
    }
    return id;
}

void vec_release(Store *s, int64_t id) {
    s->v(id).clear();
    s->v(id).shrink_to_fit();
    s->free_slots.push_back(id);
}

int vec_size(Store *s, int64_t id) { return (int)s->v(id).size(); }

void vec_export(Store *s, int64_t id, int8_t *types, int32_t *vals,
                double *bl1, double *bl2, uint8_t *bits, double *probs) {
    const Vec &v = s->v(id);
    for (size_t k = 0; k < v.size(); k++) {
        types[k] = v[k].type;
        vals[k] = v[k].val;
        bits[k] = v[k].bits;
        bl1[k] = v[k].bl1;
        bl2[k] = v[k].bl2;
        for (int i = 0; i < 4; i++) probs[k * 4 + i] = v[k].probs[i];
    }
}

int64_t k_merge(Store *s, int64_t v1, double bl1, int tip1, int64_t v2,
                double bl2, int tip2, int is_up_down, int do_shorten) {
    int64_t id = s->alloc();
    double lk;
    int rc = merge_vectors(*s, s->v(v1), bl1, tip1 != 0, s->v(v2), bl2,
                           tip2 != 0, false, is_up_down != 0, 0, 0,
                           s->v(id), &lk);
    if (rc != 0) {
        s->free_slots.push_back(id);
        return -1;
    }
    if (do_shorten) shorten_vec(*s, s->v(id));
    return id;
}

int64_t k_merge_lk(Store *s, int64_t v1, double bl1, int tip1, int64_t v2,
                   double bl2, int tip2, int is_up_down, int n_minor1,
                   int n_minor2, int do_shorten, double *lk_out) {
    int64_t id = s->alloc();
    int rc = merge_vectors(*s, s->v(v1), bl1, tip1 != 0, s->v(v2), bl2,
                           tip2 != 0, true, is_up_down != 0, n_minor1,
                           n_minor2, s->v(id), lk_out);
    if (rc != 0) {
        s->free_slots.push_back(id);
        return -10 + rc;  // -11 impossible, -12 underflow
    }
    if (do_shorten) shorten_vec(*s, s->v(id));
    return id;
}

double k_append(Store *s, int64_t vP, int64_t vC, int tip_c, double blen) {
    return append_prob_node(*s, s->v(vP), s->v(vC), tip_c != 0, blen);
}

void k_shorten(Store *s, int64_t id) { shorten_vec(*s, s->v(id)); }

double k_blen(Store *s, int64_t vP, int64_t vC, int from_tip_c) {
    return estimate_branch_length(*s, s->v(vP), s->v(vC), from_tip_c != 0);
}

int64_t k_pass(Store *s, int64_t v, const int32_t *muts, int n_mut,
               int dir_is_up, int do_shorten) {
    int64_t id = s->alloc();
    Vec tmp;  // source may be reallocated if v's slot equals id
    pass_through_branch(*s, s->v(v), muts, n_mut, dir_is_up != 0, tmp);
    s->v(id) = std::move(tmp);
    if (do_shorten) shorten_vec(*s, s->v(id));
    return id;
}

int64_t k_root_vector(Store *s, int64_t v, double blen, int from_tip,
                      int do_shorten) {
    int64_t id = s->alloc();
    Vec tmp;
    root_vector_frame(*s, s->v(v), blen, from_tip != 0, tmp);
    s->v(id) = std::move(tmp);
    if (do_shorten) shorten_vec(*s, s->v(id));
    return id;
}

double k_find_prob_root(Store *s, int64_t v) {
    return find_prob_root_frame(*s, s->v(v));
}

int k_different(Store *s, int64_t v1, int64_t v2) {
    if (v2 < 0) return 1;
    return are_vectors_different(*s, s->v(v1), s->v(v2)) ? 1 : 0;
}

int k_minor(Store *s, int64_t v1, int64_t v2, int only_identical) {
    return is_minor_sequence(*s, s->v(v1), s->v(v2), only_identical != 0);
}

void k_pseudo_counts(Store *s, int64_t v1, int64_t v2, double *counts) {
    update_pseudo_counts(*s, s->v(v1), s->v(v2), counts);
}

int k_num_non4(Store *s, int64_t v) {
    int n = 0;
    for (const Entry &e : s->v(v))
        if (e.type < 4) n++;
    return n;
}



}  // extern "C"
