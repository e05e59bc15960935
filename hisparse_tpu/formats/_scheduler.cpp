// Wavepack wave scheduler — C++ twin of formats/wavepack.py::_schedule.
//
// The role of this code in the framework matches the reference's CPU
// preprocessor hot loops (csr2cpsr + packing, sw/data_formatter.h:465-544,
// sw/host.cpp:163-231): an O(nnz)-ish sequential pass that must hit the
// paper's preprocessing budget (Table 8: <= ~11 s for 124M nonzeros on one
// thread).  The algorithm is byte-identical to the Python reference
// implementation so tests can compare outputs exactly:
//
//   per (block, part) segment, per stripe: greedy per-wave maximal matching
//   between pending *columns* (dedup'd gather slots) and free banks,
//   visiting columns by remaining-rows descending (stable), placing every
//   still-free row lane of the visited column.
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
  std::vector<Item*> pending, next_pending;
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

      int64_t k = 0;
      bool used_banks[128], used_rows[128];
      while (!pending.empty()) {
        std::stable_sort(pending.begin(), pending.end(),
                         [](const Item* x, const Item* y) {
                           return x->remaining > y->remaining;
                         });
        std::memset(used_banks, 0, sizeof used_banks);
        std::memset(used_rows, 0, sizeof used_rows);
        next_pending.clear();
        for (Item* it : pending) {
          int32_t lane; uint8_t ch;
          if (!used_banks[it->bank]) {
            lane = it->bank; ch = 0;
          } else if (!used_banks[it->bank2]) {
            lane = it->bank2; ch = 1;
          } else {
            next_pending.push_back(it);
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
          if (placed) used_banks[lane] = true;
          if (it->remaining) next_pending.push_back(it);
        }
        pending.swap(next_pending);
        ++k;
      }
      i = send;
    }
  }
}
