// Native paged-KV allocator + prefix-cache index — C++ runtime tier of
// the serving engine (parallel/serving.py).
//
// The reference keeps its entire runtime (harness, timing, memory) in
// C++ (aarch64/test_MMult.cpp:24-144); this is the framework's native
// equivalent for the serving runtime's memory manager: the block-table
// page pool, refcounted prefix sharing, LRU retirement of finished
// prefixes, and recompute-preemption bookkeeping. Semantics mirror the
// Python allocator (parallel/kv_alloc.py PagedAllocatorPy) exactly —
// a randomized parity test drives both through identical op sequences
// (tests/test_kv_alloc.py).
//
// Loaded via ctypes (utils/native.py pattern); C ABI, no pybind11.

#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;
using std::uint64_t;

// 128-bit FNV-1a chain key over (adapter, token prefix). The Python
// allocator uses sha1; keys never cross the language boundary, so only
// hit/miss BEHAVIOR must match (collision-free in practice).
struct Key {
    uint64_t a, b;
    bool operator<(const Key& o) const {
        return a != o.a ? a < o.a : b < o.b;
    }
    bool operator==(const Key& o) const { return a == o.a && b == o.b; }
};

inline uint64_t fnv1a(const unsigned char* p, int64_t n, uint64_t h) {
    for (int64_t i = 0; i < n; ++i) {
        h ^= p[i];
        h *= 0x100000001B3ULL;
    }
    return h;
}

Key chunk_key(const int32_t* tokens, int64_t n_prefix, int64_t adapter) {
    unsigned char ad[8];
    std::memcpy(ad, &adapter, 8);
    const unsigned char* tp =
        reinterpret_cast<const unsigned char*>(tokens);
    Key k;
    k.a = fnv1a(tp, n_prefix * 4, fnv1a(ad, 8, 0xCBF29CE484222325ULL));
    k.b = fnv1a(tp, n_prefix * 4, fnv1a(ad, 8, 0x84222325CBF29CE4ULL));
    return k;
}

struct Alloc {
    int64_t n_pages, page, batch, np_max;
    bool prefix_cache;
    std::vector<int64_t> free_list;              // LIFO, like list.pop()
    std::vector<std::vector<int64_t>> slot_pages;
    std::vector<int32_t> table;                  // (batch, np_max)
    std::vector<int64_t> refcount;
    std::map<Key, int64_t> prefix_index;         // chain key -> page
    std::unordered_map<int64_t, Key> page_key;   // page -> its key
    // refcount-0 registered pages, LRU by retire order (OrderedDict)
    std::map<int64_t, int64_t> lru;              // order -> page
    std::unordered_map<int64_t, int64_t> lru_pos;  // page -> order
    int64_t lru_seq = 0;
    int64_t hit_tokens = 0;

    explicit Alloc(int64_t np, int64_t pg, int64_t b, int64_t nm, bool pc)
        : n_pages(np), page(pg), batch(b), np_max(nm), prefix_cache(pc),
          slot_pages(b), table(b * nm, 0), refcount(np, 0) {
        // page 0 is the reserved trash page; hand out n-1 .. 1 (LIFO of
        // [1..n), matching Python's list(range(1, n)).pop())
        free_list.reserve(np - 1);
        for (int64_t p = 1; p < np; ++p) free_list.push_back(p);
    }

    void lru_erase(int64_t p) {
        auto it = lru_pos.find(p);
        if (it == lru_pos.end()) return;
        lru.erase(it->second);
        lru_pos.erase(it);
    }

    void lru_push(int64_t p) {
        lru_erase(p);
        lru[lru_seq] = p;
        lru_pos[p] = lru_seq++;
    }

    // a free page, else evict the least-recently retired cached prefix
    int64_t alloc_page() {
        if (!free_list.empty()) {
            int64_t p = free_list.back();
            free_list.pop_back();
            return p;
        }
        if (prefix_cache && !lru.empty()) {
            int64_t p = lru.begin()->second;
            lru_erase(p);
            auto kit = page_key.find(p);
            if (kit != page_key.end()) {
                auto iit = prefix_index.find(kit->second);
                if (iit != prefix_index.end() && iit->second == p)
                    prefix_index.erase(iit);
                page_key.erase(kit);
            }
            return p;
        }
        return -1;
    }

    bool grow(int64_t s, int64_t n_tokens) {
        int64_t need = (n_tokens + page - 1) / page;
        while (static_cast<int64_t>(slot_pages[s].size()) < need) {
            int64_t p = alloc_page();
            if (p < 0) return false;  // partial growth kept (caller may release)
            if (prefix_cache) refcount[p] = 1;
            table[s * np_max + slot_pages[s].size()] = static_cast<int32_t>(p);
            slot_pages[s].push_back(p);
        }
        return true;
    }

    void release(int64_t s) {
        for (int64_t p : slot_pages[s]) {
            if (prefix_cache) {
                if (--refcount[p] == 0) {
                    auto kit = page_key.find(p);
                    bool registered =
                        kit != page_key.end() &&
                        prefix_index.count(kit->second) &&
                        prefix_index[kit->second] == p;
                    if (registered) {
                        lru_push(p);  // retire, evict last
                    } else {
                        if (kit != page_key.end()) page_key.erase(kit);
                        free_list.push_back(p);
                    }
                }
            } else {
                free_list.push_back(p);
            }
        }
        slot_pages[s].clear();
        std::memset(&table[s * np_max], 0, np_max * 4);
    }

    // admission-time prefix attach: every cached full page of the
    // prompt, capped so >= 1 suffix token remains to prefill
    int64_t attach(int64_t s, const int32_t* tokens, int64_t n,
                   int64_t adapter) {
        if (!prefix_cache) return 0;
        int64_t got = 0;
        int64_t cap = (n - 1) / page;
        for (int64_t c = 0; c < cap; ++c) {
            auto it = prefix_index.find(
                chunk_key(tokens, (c + 1) * page, adapter));
            if (it == prefix_index.end()) break;
            int64_t p = it->second;
            table[s * np_max + c] = static_cast<int32_t>(p);
            slot_pages[s].push_back(p);
            ++refcount[p];
            lru_erase(p);
            got += page;
        }
        hit_tokens += got;
        return got;
    }

    // post-prefill registration of fully-covered pages
    void reg(int64_t s, const int32_t* tokens, int64_t n,
             int64_t adapter) {
        if (!prefix_cache) return;
        for (int64_t c = 0; c < n / page; ++c) {
            int64_t p = table[s * np_max + c];
            if (p == 0) break;
            Key k = chunk_key(tokens, (c + 1) * page, adapter);
            if (!prefix_index.count(k)) {
                prefix_index[k] = p;
                page_key[p] = k;
            }
        }
    }
};

}  // namespace

extern "C" {

void* pa_new(int64_t n_pages, int64_t page, int64_t batch,
             int64_t np_max, int prefix_cache) {
    return new Alloc(n_pages, page, batch, np_max, prefix_cache != 0);
}

void pa_delete(void* h) { delete static_cast<Alloc*>(h); }

int pa_grow_slot(void* h, int64_t s, int64_t n_tokens) {
    return static_cast<Alloc*>(h)->grow(s, n_tokens) ? 1 : 0;
}

void pa_release_slot(void* h, int64_t s) {
    static_cast<Alloc*>(h)->release(s);
}

int64_t pa_attach_prefix(void* h, int64_t s, const int32_t* tokens,
                         int64_t n, int64_t adapter) {
    return static_cast<Alloc*>(h)->attach(s, tokens, n, adapter);
}

void pa_register_prefix(void* h, int64_t s, const int32_t* tokens,
                        int64_t n, int64_t adapter) {
    static_cast<Alloc*>(h)->reg(s, tokens, n, adapter);
}

// live row-major (batch, np_max) int32 view — valid until pa_delete
const int32_t* pa_table_ptr(void* h) {
    return static_cast<Alloc*>(h)->table.data();
}

int64_t pa_free_pages(void* h) {
    return static_cast<int64_t>(static_cast<Alloc*>(h)->free_list.size());
}

int64_t pa_cached_pages(void* h) {
    return static_cast<int64_t>(static_cast<Alloc*>(h)->lru.size());
}

int64_t pa_hit_tokens(void* h) {
    return static_cast<Alloc*>(h)->hit_tokens;
}

int64_t pa_slot_npages(void* h, int64_t s) {
    return static_cast<int64_t>(
        static_cast<Alloc*>(h)->slot_pages[s].size());
}

}  // extern "C"
