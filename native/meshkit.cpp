// meshkit — native host runtime for mesh/DoF construction.
//
// The reference delegates its heavy host-side setup to native libraries
// (deal.II DoFHandler numbering, p4est partition/ghost construction —
// SURVEY.md §2.5).  This library is the TPU framework's native
// equivalent for the hot host paths:
//   - quantized node deduplication (DoF numbering): sort + unique +
//     inverse over [M, d] int64 keys,
//   - Morton (space-filling-curve) codes for element partitioning,
//   - gather-based assembly-map construction (inverse connectivity).
//
// Exposed as a plain C ABI consumed through ctypes; the Python layer
// falls back to NumPy when the shared library is absent.
//
// Build:  g++ -O3 -shared -fPIC -o libmeshkit.so meshkit.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// Sort rows of keys[M][d] lexicographically, assign unique ids.
// Outputs: inverse[M] (row -> unique id), first_index[<=M] (unique id ->
// a representative input row).  Returns the number of unique rows.
int64_t meshkit_dedup_rows(const int64_t* keys, int64_t M, int32_t d,
                           int64_t* inverse, int64_t* first_index) {
    std::vector<int64_t> order(M);
    std::iota(order.begin(), order.end(), 0);
    auto less = [keys, d](int64_t a, int64_t b) {
        const int64_t* ra = keys + a * d;
        const int64_t* rb = keys + b * d;
        for (int32_t k = 0; k < d; ++k) {
            if (ra[k] != rb[k]) return ra[k] < rb[k];
        }
        return false;
    };
    std::sort(order.begin(), order.end(), less);

    auto equal = [keys, d](int64_t a, int64_t b) {
        return std::memcmp(keys + a * d, keys + b * d,
                           sizeof(int64_t) * d) == 0;
    };
    int64_t n_unique = 0;
    for (int64_t i = 0; i < M; ++i) {
        if (i == 0 || !equal(order[i], order[i - 1])) {
            first_index[n_unique] = order[i];
            ++n_unique;
        }
        inverse[order[i]] = n_unique - 1;
    }
    return n_unique;
}

// Interleave per-axis quantized coordinates into Morton codes.
void meshkit_morton_codes(const uint64_t* q, int64_t E, int32_t d,
                          int32_t bits, uint64_t* codes) {
    for (int64_t e = 0; e < E; ++e) {
        uint64_t code = 0;
        for (int32_t b = 0; b < bits; ++b) {
            for (int32_t k = 0; k < d; ++k) {
                code |= ((q[e * d + k] >> b) & 1ull)
                        << (uint64_t)(b * d + k);
            }
        }
        codes[e] = code;
    }
}

// Inverse connectivity: for each node, the flat (elem*nn + local) slots
// contributing to it, padded with `pad_value` up to max multiplicity.
// idx must hold n_nodes * max_mult entries; counts n_nodes entries.
// Returns the max multiplicity actually used (<= max_mult) or -1 if a
// node exceeds max_mult.
int64_t meshkit_assembly_map(const int32_t* elem_nodes, int64_t E,
                             int32_t nn, int64_t n_nodes,
                             int64_t exclude_node, int64_t max_mult,
                             int64_t pad_value, int64_t* idx,
                             int64_t* counts) {
    std::fill(counts, counts + n_nodes, 0);
    std::fill(idx, idx + n_nodes * max_mult, pad_value);
    int64_t used = 0;
    for (int64_t e = 0; e < E; ++e) {
        for (int32_t k = 0; k < nn; ++k) {
            int64_t node = elem_nodes[e * nn + k];
            if (node == exclude_node || node < 0 || node >= n_nodes)
                continue;
            int64_t c = counts[node];
            if (c >= max_mult) return -1;
            idx[node * max_mult + c] = e * nn + k;
            counts[node] = c + 1;
            if (c + 1 > used) used = c + 1;
        }
    }
    return used;
}

}  // extern "C"
