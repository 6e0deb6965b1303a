// Native lattice builder: the host-side sparse forward-backward over
// device-pruned record arcs (the GetRawLattice + forward-backward
// prune role; reference: src/decoder/lattice-faster-decoder.h:96-364
// GetRawLattice / PruneActiveTokens, re-expressed over flat record
// arrays instead of token lists).
//
// Replaces the per-frame numpy loop of
// kaldi_aslp_tpu/decoder/beam.py:_build_lattice: at T=6000 with ~5
// records/frame that loop spends ~1 s in 700k+ python/numpy calls on
// arrays of a few elements — pure interpreter overhead.  This is one
// tight pass; semantics are mirrored exactly (the python path stays as
// the fallback and the property-test oracle).
//
// C ABI (ctypes).  All state/arc ids are int64, scores double (the
// python builder is f64 end-to-end so the prune is bit-comparable).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <limits>
#include <vector>
#include <unordered_map>
#include <algorithm>

namespace {

struct ClosureEnt {
  int64_t u, v;
  double w;
  int32_t cnt;
  int32_t words[8];  // wmax <= 8 enforced by the wrapper
};

struct Folded {
  std::vector<int64_t> u, dst;
  std::vector<int32_t> tid;
  std::vector<double> w, ac, base;
  std::vector<int32_t> words;  // [n, wmax]
  std::vector<int32_t> wcnt;
};

// Best (cost, word-string) eps path u->v over the given arcs for every
// source (identity rows included); at most `rounds` hops.  Mirrors
// beam.py:_closure_arrays (keep-min per (u, v), earliest entry wins
// ties).  Returns false on an eps word chain longer than wmax.
bool eps_closure(const int32_t* g_src, const int32_t* g_dst,
                 const int32_t* g_olabel, const float* g_weight,
                 const std::vector<int64_t>& sources,
                 const int64_t* arcs, int64_t n_arcs,
                 int64_t rounds, int64_t wmax,
                 std::vector<ClosureEnt>& clo) {
  clo.clear();
  for (int64_t s : sources) {
    ClosureEnt e;
    e.u = s; e.v = s; e.w = 0.0; e.cnt = 0;
    clo.push_back(e);
  }
  if (n_arcs == 0 || sources.empty()) return true;
  std::unordered_multimap<int64_t, int64_t> eps_by_src;
  for (int64_t i = 0; i < n_arcs; i++)
    eps_by_src.emplace((int64_t)g_src[arcs[i]], arcs[i]);
  std::unordered_map<int64_t, size_t> pair_best;
  for (size_t i = 0; i < clo.size(); i++)
    pair_best[(clo[i].u << 32) | clo[i].v] = i;
  for (int64_t r = 0; r < rounds; r++) {
    size_t end = clo.size();
    bool grew = false;
    for (size_t i = 0; i < end; i++) {
      auto range = eps_by_src.equal_range(clo[i].v);
      for (auto it = range.first; it != range.second; ++it) {
        int64_t a = it->second;
        ClosureEnt e = clo[i];
        e.v = (int64_t)g_dst[a];
        e.w += (double)g_weight[a];
        if (g_olabel[a] > 0) {
          if (e.cnt >= wmax) return false;
          e.words[e.cnt++] = g_olabel[a];
        }
        int64_t key = (e.u << 32) | e.v;
        auto f = pair_best.find(key);
        if (f == pair_best.end()) {
          pair_best[key] = clo.size();
          clo.push_back(e);
          grew = true;
        } else if (e.w < clo[f->second].w) {
          clo[f->second] = e;
          grew = true;
        }
      }
    }
    if (!grew) break;
  }
  return true;
}

}  // namespace

extern "C" int64_t lattice_build(
    // graph arrays (PackedGraph), indexed by global arc id
    const int32_t* g_src, const int32_t* g_dst, const int32_t* g_ilabel,
    const int32_t* g_olabel, const float* g_weight, int64_t n_states,
    // acoustics: ll [T, P] row-major + tid->pdf lut
    const float* ll, int64_t T, int64_t P, const int32_t* tid_pdf,
    double scale,
    // records, ALREADY bucketed/deduped by python: eps arcs at times
    // 0..T (time-shifted +1 like the python builder, incl. the init
    // closure arcs at t=0), em arcs at times 0..T-1; both sorted by t
    const int64_t* eps_t, const int64_t* eps_arc, int64_t n_eps,
    const int64_t* em_t, const int64_t* em_arc, int64_t n_em,
    // initial frontier (state, score) pairs
    const int64_t* init_states, const double* init_scores, int64_t n_init,
    // base finals (graph finals or pseudo-finals as pairs); when
    // fold_suffix != 0 the time-T eps records are closed from the
    // exact live-at-T set and folded into these using g_final
    const int64_t* final_states, const double* final_costs, int64_t n_final,
    int64_t fold_suffix, const float* g_final,
    double best_score, double lattice_beam, int64_t rounds, int64_t wmax,
    // outputs (caller-allocated, capacity cap); returns kept count, or
    // -(needed) if cap is too small, or -1000000000 - code on errors
    int64_t cap, int32_t* out_tend, int64_t* out_u, int64_t* out_dst,
    int32_t* out_tid, double* out_w, double* out_ac,
    int32_t* out_words /* [cap * wmax] */, int32_t* out_wcnt,
    // updated finals out: count written to out_fin_count[0]; if it
    // exceeds fin_cap the call must be retried with more room
    int64_t fin_cap, int64_t* out_fin_states, double* out_fin_costs,
    int64_t* out_fin_count) {
  if (wmax > 8 || wmax < 1 || T < 0) return -1000000001;

  const double NEG = -std::numeric_limits<double>::infinity();
  std::vector<double> FD((size_t)n_states, NEG);
  std::vector<int64_t> live;
  live.reserve(1024);
  for (int64_t i = 0; i < n_init; i++) {
    int64_t s = init_states[i];
    if (FD[(size_t)s] == NEG) live.push_back(s);
    if (init_scores[i] > FD[(size_t)s]) FD[(size_t)s] = init_scores[i];
  }

  // per-time record spans (inputs sorted by t)
  std::vector<int64_t> eps_start((size_t)T + 2, 0), em_start((size_t)T + 1, 0);
  {
    int64_t p = 0;
    for (int64_t t = 0; t <= T; t++) {
      while (p < n_eps && eps_t[p] < t) p++;
      eps_start[(size_t)t] = p;
    }
    eps_start[(size_t)T + 1] = n_eps;
    p = 0;
    for (int64_t t = 0; t < T; t++) {
      while (p < n_em && em_t[p] < t) p++;
      em_start[(size_t)t] = p;
    }
    em_start[(size_t)T] = n_em;
  }

  std::vector<Folded> folded((size_t)T);
  std::vector<ClosureEnt> clo;
  std::unordered_multimap<int64_t, size_t> by_v;  // v -> closure idx

  for (int64_t t = 0; t < T; t++) {
    Folded& F = folded[(size_t)t];
    int64_t e0 = eps_start[(size_t)t], e1 = eps_start[(size_t)t + 1];
    int64_t m0 = em_start[(size_t)t], m1 = em_start[(size_t)t + 1];
    if (m1 == m0 || live.empty()) {
      for (int64_t s : live) FD[(size_t)s] = NEG;
      live.clear();
      continue;
    }
    if (!eps_closure(g_src, g_dst, g_olabel, g_weight, live,
                     eps_arc + e0, e1 - e0, rounds, wmax, clo))
      return -1000000002;
    // ---- join closure targets with this frame's em-arc sources ------
    by_v.clear();
    for (size_t i = 0; i < clo.size(); i++) by_v.emplace(clo[i].v, i);
    for (int64_t i = m0; i < m1; i++) {
      int64_t a = em_arc[i];
      auto range = by_v.equal_range((int64_t)g_src[a]);
      for (auto it = range.first; it != range.second; ++it) {
        const ClosureEnt& c = clo[it->second];
        double w = c.w + (double)g_weight[a];
        int32_t tid = g_ilabel[a];
        double ac = -(double)ll[t * P + tid_pdf[tid]];
        F.u.push_back(c.u);
        F.dst.push_back((int64_t)g_dst[a]);
        F.tid.push_back(tid);
        F.w.push_back(w);
        F.ac.push_back(ac);
        F.base.push_back(FD[(size_t)c.u]);
        size_t wpos = F.words.size();
        F.words.resize(wpos + (size_t)wmax, -1);
        int32_t cnt = c.cnt;
        for (int32_t k = 0; k < cnt; k++) F.words[wpos + k] = c.words[k];
        if (g_olabel[a] > 0) {
          if (cnt >= (int32_t)wmax) return -1000000002;
          F.words[wpos + cnt] = g_olabel[a];
          cnt++;
        }
        F.wcnt.push_back(cnt);
      }
    }
    // ---- advance the dense forward plane ----------------------------
    for (int64_t s : live) FD[(size_t)s] = NEG;
    live.clear();
    for (size_t i = 0; i < F.u.size(); i++) {
      double cand = F.base[i] - F.w[i] - scale * F.ac[i];
      size_t d = (size_t)F.dst[i];
      if (FD[d] == NEG) live.push_back(F.dst[i]);
      if (cand > FD[d]) FD[d] = cand;
    }
  }

  // ---- finals (+ optional time-T eps-suffix folding from exact live)
  std::unordered_map<int64_t, double> finmap;
  for (int64_t i = 0; i < n_final; i++) {
    auto f = finmap.find(final_states[i]);
    if (f == finmap.end() || final_costs[i] < f->second)
      finmap[final_states[i]] = final_costs[i];
  }
  {
    int64_t e0 = eps_start[(size_t)T], e1 = eps_start[(size_t)T + 1];
    if (fold_suffix && e1 > e0 && !live.empty()) {
      if (!eps_closure(g_src, g_dst, g_olabel, g_weight, live,
                       eps_arc + e0, e1 - e0, rounds, wmax, clo))
        return -1000000002;
      for (const ClosureEnt& c : clo) {
        double fc = (double)g_final[(size_t)c.v];
        if (!std::isfinite(fc)) continue;
        double cand = c.w + fc;
        auto f = finmap.find(c.u);
        if (f == finmap.end() || cand < f->second) finmap[c.u] = cand;
      }
    }
  }
  for (int64_t s : live) FD[(size_t)s] = NEG;

  // ---- backward pass ------------------------------------------------
  std::vector<double> BD((size_t)n_states, NEG);
  std::vector<int64_t> btouched;
  for (auto& kv : finmap) {
    if (BD[(size_t)kv.first] == NEG) btouched.push_back(kv.first);
    double v = -kv.second;
    if (v > BD[(size_t)kv.first]) BD[(size_t)kv.first] = v;
  }
  std::vector<std::vector<double>> tails((size_t)T);
  for (int64_t t = T - 1; t >= 0; t--) {
    Folded& F = folded[(size_t)t];
    if (F.u.empty()) {
      for (int64_t s : btouched) BD[(size_t)s] = NEG;
      btouched.clear();
      continue;
    }
    std::vector<double>& tl = tails[(size_t)t];
    tl.resize(F.u.size());
    for (size_t i = 0; i < F.u.size(); i++)
      tl[i] = BD[(size_t)F.dst[i]];
    for (int64_t s : btouched) BD[(size_t)s] = NEG;
    btouched.clear();
    for (size_t i = 0; i < F.u.size(); i++) {
      double cand = tl[i] - F.w[i] - scale * F.ac[i];
      size_t u = (size_t)F.u[i];
      if (BD[u] == NEG) btouched.push_back(F.u[i]);
      if (cand > BD[u]) BD[u] = cand;
    }
  }

  // ---- emit finals ----------------------------------------------------
  {
    int64_t n = 0;
    for (auto& kv : finmap) {
      if (n < fin_cap) {
        out_fin_states[n] = kv.first;
        out_fin_costs[n] = kv.second;
      }
      n++;
    }
    out_fin_count[0] = n;
    if (n > fin_cap) return -1000000003;
  }

  // ---- prune + emit ---------------------------------------------------
  double thresh = best_score - lattice_beam - 1e-9;
  int64_t n_out = 0;
  for (int64_t t = 0; t < T; t++) {
    Folded& F = folded[(size_t)t];
    for (size_t i = 0; i < F.u.size(); i++) {
      double tot = F.base[i] - F.w[i] - scale * F.ac[i]
                   + tails[(size_t)t][i];
      if (!(tot >= thresh)) continue;
      if (n_out < cap) {
        out_tend[n_out] = (int32_t)(t + 1);
        out_u[n_out] = F.u[i];
        out_dst[n_out] = F.dst[i];
        out_tid[n_out] = F.tid[i];
        out_w[n_out] = F.w[i];
        out_ac[n_out] = F.ac[i];
        std::memcpy(out_words + n_out * wmax,
                    F.words.data() + i * (size_t)wmax,
                    sizeof(int32_t) * (size_t)wmax);
        out_wcnt[n_out] = F.wcnt[i];
      }
      n_out++;
    }
  }
  if (n_out > cap) return -n_out;
  return n_out;
}
