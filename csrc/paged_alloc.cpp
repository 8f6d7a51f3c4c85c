// Native paged-KV allocator + prefix-cache index — C++ runtime tier of
// the serving engine's memory manager (parallel/kv_alloc.py defines the
// Python reference backend and the shared surface; parallel/serving.py
// selects a backend with alloc_backend="py"|"native").
//
// The reference keeps its entire runtime (harness, timing, memory) in
// C++ (aarch64/test_MMult.cpp:24-144); this is the framework's native
// equivalent for the serving runtime's memory manager: the block-table
// page pool, refcounted prefix sharing, LRU retirement of finished
// prefixes, and recompute-preemption bookkeeping. Semantics mirror
// PagedAllocatorPy exactly — a randomized parity test drives both
// backends through identical op sequences and asserts identical
// tables, stats, and hit/miss behavior (tests/test_kv_alloc.py).
//
// Prefix-cache keys are the SAME rolling sha1 chain as the Python side
// (key_c = sha1(key_{c-1} || page tokens), seeded with sha1(adapter)):
// collision-resistant — a crafted non-cryptographic-hash collision
// would attach another request's cached KV pages (cross-request KV
// leakage) — and byte-identical across backends, so parity holds at
// the key level, not just behaviorally.
//
// Loaded via ctypes (utils/native.py pattern); C ABI, no pybind11.

#include <array>
#include <cstdint>
#include <cstring>
#include <map>
#include <unordered_map>
#include <vector>

namespace {

using std::int32_t;
using std::int64_t;
using std::size_t;
using std::uint32_t;
using std::uint64_t;

// ------------------------------------------------------------- SHA-1
// Single-shot SHA-1 per FIPS 180-1 / RFC 3174 (matches hashlib.sha1).
// Inputs here are tiny (20-byte chain key + one page of tokens), so a
// one-buffer implementation is all that's needed.

inline uint32_t rol(uint32_t x, int s) {
    return (x << s) | (x >> (32 - s));
}

void sha1(const unsigned char* data, size_t len, unsigned char out[20]) {
    uint32_t h[5] = {0x67452301u, 0xEFCDAB89u, 0x98BADCFEu,
                     0x10325476u, 0xC3D2E1F0u};
    // message + 0x80 + zero pad + 64-bit big-endian bit length
    size_t total = ((len + 8) / 64 + 1) * 64;
    std::vector<unsigned char> msg(total, 0);
    std::memcpy(msg.data(), data, len);
    msg[len] = 0x80;
    uint64_t bits = static_cast<uint64_t>(len) * 8;
    for (int i = 0; i < 8; ++i)
        msg[total - 1 - i] = static_cast<unsigned char>(bits >> (8 * i));

    for (size_t off = 0; off < total; off += 64) {
        uint32_t w[80];
        for (int t = 0; t < 16; ++t)
            w[t] = (uint32_t(msg[off + 4 * t]) << 24) |
                   (uint32_t(msg[off + 4 * t + 1]) << 16) |
                   (uint32_t(msg[off + 4 * t + 2]) << 8) |
                   uint32_t(msg[off + 4 * t + 3]);
        for (int t = 16; t < 80; ++t)
            w[t] = rol(w[t - 3] ^ w[t - 8] ^ w[t - 14] ^ w[t - 16], 1);
        uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
        for (int t = 0; t < 80; ++t) {
            uint32_t f, k;
            if (t < 20)      { f = (b & c) | (~b & d);          k = 0x5A827999u; }
            else if (t < 40) { f = b ^ c ^ d;                   k = 0x6ED9EBA1u; }
            else if (t < 60) { f = (b & c) | (b & d) | (c & d); k = 0x8F1BBCDCu; }
            else             { f = b ^ c ^ d;                   k = 0xCA62C1D6u; }
            uint32_t tmp = rol(a, 5) + f + e + k + w[t];
            e = d; d = c; c = rol(b, 30); b = a; a = tmp;
        }
        h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
    }
    for (int i = 0; i < 5; ++i) {
        out[4 * i] = static_cast<unsigned char>(h[i] >> 24);
        out[4 * i + 1] = static_cast<unsigned char>(h[i] >> 16);
        out[4 * i + 2] = static_cast<unsigned char>(h[i] >> 8);
        out[4 * i + 3] = static_cast<unsigned char>(h[i]);
    }
}

using Key = std::array<unsigned char, 20>;

// Rolling chain-key iterator: seed = sha1(adapter as 8 LE bytes);
// next(page_tokens) = sha1(prev || tokens) — identical bytes to
// kv_alloc._chain_keys.
struct ChainKeys {
    Key prev;
    explicit ChainKeys(int64_t adapter) {
        unsigned char ad[8];
        std::memcpy(ad, &adapter, 8);   // little-endian on all targets
        sha1(ad, 8, prev.data());
    }
    const Key& next(const int32_t* page_tokens, int64_t n_tok) {
        std::vector<unsigned char> buf(20 + n_tok * 4);
        std::memcpy(buf.data(), prev.data(), 20);
        std::memcpy(buf.data() + 20, page_tokens, n_tok * 4);
        sha1(buf.data(), buf.size(), prev.data());
        return prev;
    }
};

struct KeyHash {
    size_t operator()(const Key& k) const {
        uint64_t v;
        std::memcpy(&v, k.data(), 8);   // sha1 output is already uniform
        return static_cast<size_t>(v);
    }
};

struct Alloc {
    int64_t n_pages, page, batch, np_max;
    bool prefix_cache;
    std::vector<int64_t> free_list;              // LIFO, like list.pop()
    std::vector<std::vector<int64_t>> slot_pages;
    std::vector<int32_t> table;                  // (batch, np_max)
    std::vector<int64_t> refcount;
    std::unordered_map<Key, int64_t, KeyHash> prefix_index;  // key -> page
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

    bool slot_ok(int64_t s) const { return s >= 0 && s < batch; }

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
        if (!slot_ok(s)) return false;
        int64_t need = (n_tokens + page - 1) / page;
        // where the Python backend's table write would raise, fail the
        // growth instead of silently writing past the row
        if (need > np_max) return false;
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
        if (!slot_ok(s)) return;
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
        // admission-time operation on an EMPTY slot only (page c must
        // be table column c) — mirrors PagedAllocatorPy.attach
        if (!prefix_cache || !slot_ok(s) || !slot_pages[s].empty())
            return 0;
        int64_t got = 0;
        int64_t cap = (n - 1) / page;
        if (cap > np_max) cap = np_max;   // table row bound
        ChainKeys keys(adapter);
        for (int64_t c = 0; c < cap; ++c) {
            const Key& k = keys.next(tokens + c * page, page);
            auto it = prefix_index.find(k);
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
        if (!prefix_cache || !slot_ok(s)) return;
        int64_t cap = n / page;
        if (cap > np_max) cap = np_max;
        ChainKeys keys(adapter);
        for (int64_t c = 0; c < cap; ++c) {
            const Key& k = keys.next(tokens + c * page, page);
            int64_t p = table[s * np_max + c];
            if (p == 0) break;
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
    Alloc* a = static_cast<Alloc*>(h);
    if (!a->slot_ok(s)) return 0;
    return static_cast<int64_t>(a->slot_pages[s].size());
}

}  // extern "C"
