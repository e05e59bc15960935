// Wavepack wave scheduler — C++ twin of formats/wavepack.py::_schedule.
//
// The role of this code in the framework matches the reference's CPU
// preprocessor hot loops (csr2cpsr + packing, sw/data_formatter.h:465-544,
// sw/host.cpp:163-231): an O(nnz)-ish sequential pass that must hit the
// paper's preprocessing budget (Table 8: <= ~11 s for 124M nonzeros on one
// thread).  The algorithm is byte-identical to the Python reference
// implementation so tests can compare outputs exactly:
//
//   per (block, part) segment, per stripe: greedy per-wave matching between
//   pending *columns* (dedup'd gather slots, two candidate banks each) and
//   free banks, visiting columns by remaining-rows descending, placing
//   every still-free row lane of the visited column.  The wave ends as soon
//   as all 128 row lanes or all 128 banks are consumed; the visit order is
//   maintained incrementally (modified items re-merged) instead of
//   re-sorted, keeping the pass near-linear.
//
// Build: g++ -O2 -shared -fPIC -o _scheduler.so _scheduler.cpp
#include <cstdint>
#include <vector>
#include <algorithm>
#include <cstring>

namespace {

struct Item {
  int32_t bank;     // first-choice gather lane
  int32_t bank2;    // second-choice gather lane (== bank if disabled)
  int32_t remaining;
  int32_t head;     // index into nz-index storage
  int32_t count;    // total entries
  int32_t alive0;   // first alive offset hint
};

}  // namespace

extern "C" void wp_schedule_segments(
    int64_t n_segs, const int64_t* seg_bounds,
    const int32_t* stripe, const int32_t* lam,
    const int32_t* bank, const int32_t* addr,
    const int32_t* bank2,
    int64_t* k_of, uint8_t* choice) {
  std::vector<int64_t> store;      // nz indices per item, CSR order
  std::vector<Item> items;
  std::vector<Item*> pending;
  std::vector<uint8_t> alive;

  for (int64_t seg = 0; seg < n_segs; ++seg) {
    int64_t lo = seg_bounds[seg], hi = seg_bounds[seg + 1];
    int64_t i = lo;
    while (i < hi) {
      // stripe run
      int32_t st = stripe[i];
      int64_t send = i;
      while (send < hi && stripe[send] == st) ++send;

      // build items: runs of equal (bank, addr) — input is sorted
      items.clear();
      store.clear();
      int64_t p = i;
      while (p < send) {
        int32_t b = bank[p], a = addr[p];
        Item it;
        it.bank = b;
        it.bank2 = bank2[p];
        it.head = static_cast<int32_t>(store.size());
        while (p < send && bank[p] == b && addr[p] == a) {
          store.push_back(p);
          ++p;
        }
        it.count = static_cast<int32_t>(store.size()) - it.head;
        it.remaining = it.count;
        it.alive0 = 0;
        items.push_back(it);
      }
      alive.assign(store.size(), 1);

      pending.clear();
      for (auto& it : items) pending.push_back(&it);
      std::stable_sort(pending.begin(), pending.end(),
                       [](const Item* x, const Item* y) {
                         return x->remaining > y->remaining;
                       });

      int64_t k = 0;
      bool used_banks[128], used_rows[128];
      while (!pending.empty()) {
        std::memset(used_banks, 0, sizeof used_banks);
        std::memset(used_rows, 0, sizeof used_rows);
        int rows_used = 0, banks_used = 0;
        // cursor walk with lazy swap-removal of drained items; stops at
        // bank/row exhaustion — O(visited) per wave instead of an O(list)
        // rebuild (see wp_schedule_bm for the rationale)
        size_t idx = 0;
        int32_t fruitless = 0;
        while (idx < pending.size()) {
          if (rows_used == 128 || banks_used == 128
              || fruitless >= 128) break;
          Item* it = pending[idx];
          if (it->remaining == 0) {             // drained: swap-remove
            pending[idx] = pending.back();
            pending.pop_back();
            continue;                            // revisit slot idx
          }
          int32_t lane;
          uint8_t ch;
          if (!used_banks[it->bank]) {
            lane = it->bank; ch = 0;
          } else if (!used_banks[it->bank2]) {
            lane = it->bank2; ch = 1;
          } else {
            ++idx;
            ++fruitless;
            continue;
          }
          int32_t placed = 0;
          int32_t first_alive = -1;
          for (int32_t o = it->alive0; o < it->count; ++o) {
            if (!alive[it->head + o]) continue;
            int64_t nz = store[it->head + o];
            int32_t lm = lam[nz];
            if (used_rows[lm]) {
              if (first_alive < 0) first_alive = o;
              continue;
            }
            used_rows[lm] = true;
            alive[it->head + o] = 0;
            k_of[nz] = k;
            choice[nz] = ch;
            ++placed;
          }
          it->remaining -= placed;
          if (first_alive >= 0) it->alive0 = first_alive;
          if (placed) {
            // INVARIANT (wp_emit depends on this): marking the bank used
            // guarantees every nonzero sharing this wave's (lane) gather
            // slot came from THIS item — one (bank, addr) column — so
            // duplicate gather-slot writes in wp_emit carry identical
            // b|h fields and OR-ing them is write-order independent.
            used_banks[lane] = true;
            ++banks_used;
            rows_used += placed;
            fruitless = 0;
          } else {
            ++fruitless;
          }
          ++idx;
        }
        ++k;
      }
      i = send;
    }
  }
}

// ---------------------------------------------------------------------------
// Stream emission — C++ twin of the numpy scatter block in wavepack.pack()
// (the analog of the reference's packet-image build, sw/host.cpp:163-231).
// Writes the value tile at dest slots and the packed index word directly at
// its per-group TRANSPOSED position (the numpy path builds `packed` then
// copies through reshape/swapaxes; here idxT[t, g*128 + lane, s%128] is
// written in one pass).  Bit fields are disjoint (gather role bits 0..10,
// dest role bits 11..17) and duplicate gather-slot writes carry identical
// values, so write order does not matter — output is byte-identical to the
// numpy fallback (asserted by tests/test_formats.py).
// ---------------------------------------------------------------------------
extern "C" void wp_emit(
    int64_t nnz, const int64_t* t_glob, const int64_t* s_loc,
    const int32_t* lane_used, const int32_t* lam,
    const int32_t* bfield, const int32_t* ha_field,
    const uint32_t* vals_bits, int32_t steal_mantissa, int32_t S,
    uint32_t* vals_out, int32_t* idxT_out) {
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t s = s_loc[i];
    int64_t g = s >> 7, r = s & 127;
    size_t base = (size_t)t_glob[i] * S * 128;
    size_t gbase = base + ((size_t)g << 7) * 128;
    int32_t lane = lane_used[i];
    idxT_out[gbase + (size_t)lane * 128 + r] |= (bfield[i] << 7) | ha_field[i];
    int32_t lm = lam[i];
    if (steal_mantissa) {
      vals_out[base + (size_t)s * 128 + lm] =
          (vals_bits[i] & 0xFFFFFF80u) | (uint32_t)lane;
    } else {
      idxT_out[gbase + (size_t)lm * 128 + r] |= lane << 11;
      vals_out[base + (size_t)s * 128 + lm] = vals_bits[i];
    }
  }
}

// ---------------------------------------------------------------------------
// Block-major (class-group) scheduler — C++ twin of
// wavepack._schedule_block_major.  Same greedy, same tie-breaking, same
// incremental-merge order maintenance; outputs must match the Python twin
// exactly (tests compare them).
// ---------------------------------------------------------------------------
namespace {

struct BmItem {
  int32_t remaining;
  int32_t j1, j2, c1, c2;
  int32_t head, count, alive0;
  int64_t stamp;
};

}  // namespace

extern "C" int64_t wp_schedule_bm(
    int64_t n,
    const int32_t* sigma, const int32_t* lam, const int32_t* bank,
    const int32_t* h, const int32_t* cls, const int32_t* cls2,
    const int32_t* bank2,
    int32_t R, int32_t S, int32_t CT, int32_t K,
    const int64_t* order,            // lexsort((pos, h, bank, cls, sigma))
    int64_t min_tile,                // early stop: placements/tile floor
    int64_t* t_of, int64_t* s_of, int32_t* lane_of, int32_t* bsel_of,
    uint8_t* choice_of,
    int32_t* class_map, int64_t cap_tiles) {
  const int32_t G = S / 128;
  const int32_t Rp = R / 128;
  std::vector<int64_t> store;
  std::vector<BmItem> items;
  std::vector<uint8_t> alive;
  std::vector<std::vector<BmItem*>> pend((size_t)R * CT);
  // per (stripe, row lane, class): pending nonzeros reachable via that
  // class; rows_cnt counts rows with any (row-coverage class scoring)
  std::vector<int32_t> cnt_rlc((size_t)R * 128 * CT, 0);
  std::vector<int64_t> rows_cnt((size_t)R * CT, 0);

  // build items from sorted runs of (sigma, cls, bank, h)
  int64_t i = 0;
  int64_t total = 0;
  while (i < n) {
    int64_t nz0 = order[i];
    int32_t sg = sigma[nz0], c1 = cls[nz0], b1 = bank[nz0], hh = h[nz0];
    BmItem it;
    it.j1 = b1; it.j2 = bank2[nz0]; it.c1 = c1; it.c2 = cls2[nz0];
    it.head = (int32_t)store.size();
    int64_t j = i;
    while (j < n) {
      int64_t nz = order[j];
      if (sigma[nz] != sg || cls[nz] != c1 || bank[nz] != b1 || h[nz] != hh)
        break;
      store.push_back(nz);
      ++j;
    }
    it.count = (int32_t)store.size() - it.head;
    // reverse so scanning from alive0 yields CSR order after the Python
    // convention (Python reverses then pops from the back) — both read in
    // original CSR order; here we simply scan forward over the run.
    it.remaining = it.count;
    it.alive0 = 0;
    it.stamp = -1;
    items.push_back(it);
    i = j;
  }
  alive.assign(store.size(), 1);
  for (auto& it : items) {
    int32_t sg = sigma[store[it.head]];
    pend[(size_t)sg * CT + it.c1].push_back(&it);
    total += it.count;
    for (int32_t o = 0; o < it.count; ++o) {
      int32_t lm = lam[store[it.head + o]];
      if (++cnt_rlc[((size_t)sg * 128 + lm) * CT + it.c1] == 1)
        ++rows_cnt[(size_t)sg * CT + it.c1];
      if (it.c2 != it.c1)
        if (++cnt_rlc[((size_t)sg * 128 + lm) * CT + it.c2] == 1)
          ++rows_cnt[(size_t)sg * CT + it.c2];
    }
    if (it.c2 != it.c1) {
      pend[(size_t)sg * CT + it.c2].push_back(&it);
    }
  }
  for (auto& lst : pend)
    std::stable_sort(lst.begin(), lst.end(),
                     [](const BmItem* x, const BmItem* y) {
                       return x->remaining > y->remaining;
                     });

  for (int64_t q = 0; q < n; ++q) t_of[q] = -1;
  int64_t t = 0;
  int64_t wave_id = 0;
  int64_t scores[64];
  int32_t top[8];
  while (total > 0) {
    if (t >= cap_tiles) return -(t + 64);   // ask caller to grow
    int64_t placed_tile = 0;
    for (int32_t g = 0; g < G; ++g) {
      int32_t gmod = g % Rp;
      for (int32_t c = 0; c < CT; ++c) {
        int64_t sc = 0;
        for (int32_t u = 0; u < 128; ++u)
          sc += rows_cnt[(size_t)(gmod * 128 + u) * CT + c];
        scores[c] = sc;
      }
      // stable top-K by score desc (ties: class id asc)
      for (int32_t kk = 0; kk < K; ++kk) {
        int32_t best = -1;
        int64_t bestv = -1;
        for (int32_t c = 0; c < CT; ++c) {
          bool taken = false;
          for (int32_t q = 0; q < kk; ++q) if (top[q] == c) taken = true;
          if (taken) continue;
          if (scores[c] > bestv) { bestv = scores[c]; best = c; }
        }
        top[kk] = best;
        class_map[((size_t)t * G + g) * K + kk] = best;
      }
      if (scores[top[0]] == 0) continue;
      for (int32_t u = 0; u < 128; ++u) {
        int32_t sg = gmod * 128 + u;
        int64_t s_glob = (int64_t)g * 128 + u;
        ++wave_id;
        int32_t placed_rows = 0;
        bool used_banks[128] = {false};
        bool used_rows[128] = {false};
        int32_t banks_used = 0;
        for (int32_t ci = 0; ci < K; ++ci) {
          int32_t c = top[ci];
          // cursor walk with lazy swap-removal of drained items; stops at
          // bank/row exhaustion or a fruitless streak — O(visited) per
          // wave instead of an O(list) rebuild (the rebuild went quadratic
          // on hub-heavy graphs).  The initial descending-count order
          // decays gradually, which measures within noise of the exact
          // order on schedule fill.
          auto& lst = pend[(size_t)sg * CT + c];
          size_t ii = 0;
          int32_t fruitless = 0;
          while (ii < lst.size()) {
            if (placed_rows == 128 || banks_used == 128
                || fruitless >= 128) break;
            BmItem* it = lst[ii];
            if (it->remaining == 0) {           // drained: swap-remove
              lst[ii] = lst.back();
              lst.pop_back();
              continue;                          // revisit slot ii
            }
            if (it->stamp == wave_id) { ++ii; ++fruitless; continue; }
            bool is_primary = (it->c1 == c);
            int32_t lane = is_primary ? it->j1 : it->j2;
            if (used_banks[lane]) { ++ii; ++fruitless; continue; }
            int32_t placed = 0;
            int32_t first_alive = -1;
            for (int32_t o = it->alive0; o < it->count; ++o) {
              if (!alive[it->head + o]) continue;
              int64_t nz = store[it->head + o];
              int32_t lm = lam[nz];
              if (used_rows[lm]) {
                if (first_alive < 0) first_alive = o;
                continue;
              }
              used_rows[lm] = true;
              alive[it->head + o] = 0;
              t_of[nz] = t;
              s_of[nz] = s_glob;
              lane_of[nz] = lane;
              bsel_of[nz] = ci;
              choice_of[nz] = is_primary ? 0 : 1;
              if (--cnt_rlc[((size_t)sg * 128 + lm) * CT + it->c1] == 0)
                --rows_cnt[(size_t)sg * CT + it->c1];
              if (it->c2 != it->c1) {
                if (--cnt_rlc[((size_t)sg * 128 + lm) * CT + it->c2] == 0)
                  --rows_cnt[(size_t)sg * CT + it->c2];
              }
              ++placed;
            }
            if (first_alive >= 0) it->alive0 = first_alive;
            if (placed) {
              // same wp_emit invariant as wp_schedule_segments: a used
              // bank pins this wave's gather lane to one item's column,
              // so duplicate emission writes carry identical fields
              used_banks[lane] = true;
              ++banks_used;
              placed_rows += placed;
              placed_tile += placed;
              it->remaining -= placed;
              it->stamp = wave_id;
              total -= placed;
              fruitless = 0;
            } else {
              ++fruitless;
            }
            ++ii;
          }
        }
      }
    }
    ++t;
    if (min_tile > 0 && placed_tile < min_tile) break;
  }
  if (t == 0) {
    if (cap_tiles < 1) return -64;
    for (int32_t g = 0; g < G; ++g)
      for (int32_t kk = 0; kk < K; ++kk)
        class_map[(size_t)g * K + kk] = 0;
    t = 1;
  }
  return t;
}
