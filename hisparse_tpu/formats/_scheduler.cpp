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
  std::vector<Item*> pending, keep, modified, merged;
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
        keep.clear();
        modified.clear();
        size_t idx = 0;
        for (; idx < pending.size(); ++idx) {
          if (rows_used == 128 || banks_used == 128) break;
          Item* it = pending[idx];
          int32_t lane;
          uint8_t ch;
          if (!used_banks[it->bank]) {
            lane = it->bank; ch = 0;
          } else if (!used_banks[it->bank2]) {
            lane = it->bank2; ch = 1;
          } else {
            keep.push_back(it);
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
            used_banks[lane] = true;
            ++banks_used;
            rows_used += placed;
            if (it->remaining) modified.push_back(it);
          } else if (it->remaining) {
            keep.push_back(it);
          }
        }
        for (; idx < pending.size(); ++idx) keep.push_back(pending[idx]);
        // modified carry reduced counts; restore descending order by a
        // stable merge (keep-items precede modified on ties)
        std::stable_sort(modified.begin(), modified.end(),
                         [](const Item* x, const Item* y) {
                           return x->remaining > y->remaining;
                         });
        merged.clear();
        merged.reserve(keep.size() + modified.size());
        size_t a_ = 0, b_ = 0;
        while (a_ < keep.size() && b_ < modified.size()) {
          if (keep[a_]->remaining >= modified[b_]->remaining)
            merged.push_back(keep[a_++]);
          else
            merged.push_back(modified[b_++]);
        }
        while (a_ < keep.size()) merged.push_back(keep[a_++]);
        while (b_ < modified.size()) merged.push_back(modified[b_++]);
        pending.swap(merged);
        ++k;
      }
      i = send;
    }
  }
}
