"""Paged-KV page allocator + prefix-cache index (host runtime state).

Extracted from ``ServingEngine`` (round 3) so the same state machine has
two interchangeable backends:

- ``PagedAllocatorPy`` — the Python reference implementation (this
  file), the engine's default;
- ``PagedAllocatorNative`` — the C++ tier (``csrc/paged_alloc.cpp`` via
  ctypes, ``utils/native.py``), mirroring how the reference keeps its
  whole runtime in C++ (``aarch64/test_MMult.cpp:24-144``). A randomized
  parity test drives both through identical op sequences and asserts
  identical tables, stats, and hit behavior (tests/test_kv_alloc.py).

State machine (identical in both):

- Pages ``1..n_pages-1`` are allocatable LIFO; page 0 is the reserved
  trash page (never handed out — padded decode lanes write there).
- ``grow(s, n)`` appends pages to slot ``s``'s block table until it
  covers ``n`` tokens; returns False when the pool is dry (partial
  growth is kept — the caller releases or retries after preemption).
- With ``prefix_cache``: pages carry refcounts; full prompt pages are
  content-addressed by a ROLLING chain hash (sha1 of the previous
  page's key + this page's tokens, seeded by the LoRA adapter id) so a
  page is reusable only when everything before it matches too. Hashing
  a whole admission is O(prompt) — round 2 re-hashed the full prefix
  per page, O(prompt^2), measurable at 32k-token system prompts.
  ``release`` retires refcount-0 registered pages to an LRU pool that
  ``_alloc_page`` evicts only when the free list is empty: cached
  content never denies live capacity.
"""
from __future__ import annotations

import hashlib
from collections import OrderedDict
from typing import Iterator

import numpy as np


def _chain_keys(tokens, page: int, n_pages: int,
                adapter: int) -> Iterator[bytes]:
    """Rolling chain keys for pages 0..n_pages-1 of a token sequence:
    key_c = sha1(key_{c-1} || tokens[c*page:(c+1)*page]), seeded with
    sha1(adapter). Chain semantics: equal key_c implies the adapter and
    every token through page c match."""
    prev = hashlib.sha1(
        int(adapter).to_bytes(8, "little", signed=True)).digest()
    arr = np.asarray(tokens, np.int32)
    for c in range(n_pages):
        prev = hashlib.sha1(
            prev + arr[c * page:(c + 1) * page].tobytes()).digest()
        yield prev


class PagedAllocatorPy:
    """Python backend. Public surface shared with the native backend:
    ``grow/release/attach/register``, ``table`` (the live (batch,
    np_max) int32 block table), ``slot_pages``, ``free_pages``,
    ``cached_pages``, ``hit_tokens``."""

    def __init__(self, n_pages: int, page: int, batch: int,
                 np_max: int, prefix_cache: bool = False):
        assert n_pages >= 2, "pool needs >= 1 real page + trash"
        self.n_pages = n_pages
        self.page = page
        self.batch = batch
        self.np_max = np_max
        self.prefix_cache = prefix_cache
        self._free = list(range(1, n_pages))     # LIFO, pops n-1 first
        self.slot_pages: list[list[int]] = [[] for _ in range(batch)]
        self.table = np.zeros((batch, np_max), np.int32)
        self.hit_tokens = 0
        self._refcount = np.zeros(n_pages, np.int64)
        self._prefix_index: dict[bytes, int] = {}   # chain key -> page
        self._page_key: dict[int, bytes] = {}
        self._cached = OrderedDict()   # refcount-0 registered pages, LRU

    # ------------------------------------------------------------ stats
    @property
    def free_pages(self) -> int:
        return len(self._free)

    @property
    def cached_pages(self) -> int:
        return len(self._cached)

    def slot_npages(self, s: int) -> int:
        return len(self.slot_pages[s])

    # ------------------------------------------------------------- core
    def _alloc_page(self) -> int | None:
        """A free page, else (prefix cache) evict the least-recently
        retired cached-prefix page — cached content is a best-effort
        optimization, never a reason to deny live capacity."""
        if self._free:
            return self._free.pop()
        if self.prefix_cache and self._cached:
            p, _ = self._cached.popitem(last=False)
            key = self._page_key.pop(p)
            if self._prefix_index.get(key) == p:
                del self._prefix_index[key]
            return p
        return None

    def grow(self, s: int, n_tokens: int) -> bool:
        """Ensure slot s's table covers n_tokens; False if the pool is
        dry or n_tokens exceeds the table (caller decides: defer
        admission or preempt). Partial growth is kept."""
        need = -(-n_tokens // self.page)
        if need > self.np_max:
            return False
        while len(self.slot_pages[s]) < need:
            p = self._alloc_page()
            if p is None:
                return False
            if self.prefix_cache:
                self._refcount[p] = 1
            self.table[s, len(self.slot_pages[s])] = p
            self.slot_pages[s].append(p)
        return True

    def release(self, s: int) -> None:
        """Return slot s's pages: refcount-0 registered prefix pages
        retire to the LRU cache (a future identical prompt reattaches
        them without prefill); everything else goes back to the free
        list."""
        if self.prefix_cache:
            for p in self.slot_pages[s]:
                self._refcount[p] -= 1
                if self._refcount[p] == 0:
                    key = self._page_key.get(p)
                    if (key is not None
                            and self._prefix_index.get(key) == p):
                        self._cached[p] = None
                    else:
                        self._page_key.pop(p, None)
                        self._free.append(p)
        else:
            self._free.extend(self.slot_pages[s])
        self.slot_pages[s] = []
        self.table[s, :] = 0

    def attach(self, s: int, tokens, adapter: int = -1) -> int:
        """Admission-time prefix attach: bind every cached full page of
        the prompt to slot s (capped so >= 1 suffix token remains to
        prefill — the model must emit logits to sample). Returns the
        number of attached (cache-hit) tokens."""
        if not self.prefix_cache or self.slot_pages[s]:
            # attach is an admission-time operation on an EMPTY slot
            # (page c must be table column c); a non-empty slot is a
            # caller bug — refuse rather than desync the table
            return 0
        cap = min((len(tokens) - 1) // self.page, self.np_max)
        got = 0
        for c, key in enumerate(_chain_keys(tokens, self.page, cap,
                                            adapter)):
            p = self._prefix_index.get(key)
            if p is None:
                break
            self.table[s, c] = p
            self.slot_pages[s].append(p)
            self._refcount[p] += 1
            self._cached.pop(p, None)
            got += self.page
        self.hit_tokens += got
        return got

    def register(self, s: int, tokens, adapter: int = -1) -> None:
        """Post-prefill registration of slot s's fully-prompt-covered
        pages in the prefix index (decode never writes them: it starts
        past the last full page)."""
        if not self.prefix_cache:
            return
        cap = min(len(tokens) // self.page, self.np_max)
        for c, key in enumerate(_chain_keys(tokens, self.page, cap,
                                            adapter)):
            p = int(self.table[s, c])
            if p == 0:
                break
            if key not in self._prefix_index:
                self._prefix_index[key] = p
                self._page_key[p] = key


class PagedAllocatorNative:
    """C++ backend (csrc/paged_alloc.cpp via ctypes). Same surface and
    — by the parity test — same observable behavior as
    ``PagedAllocatorPy``; the block table is a zero-copy view of the
    C++ vector (valid for this object's lifetime)."""

    def __init__(self, n_pages: int, page: int, batch: int,
                 np_max: int, prefix_cache: bool = False):
        assert n_pages >= 2, "pool needs >= 1 real page + trash"
        from how_to_optimize_gemm_tpu.utils import native
        self._lib = native.paged_alloc_lib()
        self.n_pages = n_pages
        self.page = page
        self.batch = batch
        self.np_max = np_max
        self.prefix_cache = prefix_cache
        self._h = self._lib.pa_new(n_pages, page, batch, np_max,
                                   1 if prefix_cache else 0)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.pa_delete(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    # ------------------------------------------------------------ stats
    @property
    def table(self) -> np.ndarray:
        import ctypes
        ptr = self._lib.pa_table_ptr(self._h)
        arr = np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_int32)),
            shape=(self.batch, self.np_max))
        return arr

    @property
    def slot_pages(self) -> list[list[int]]:
        # grow/attach fill table[s] left to right in slot_pages order,
        # so the nonzero prefix of each table row IS the page list
        t = self.table
        return [list(map(int, t[s, :self.slot_npages(s)]))
                for s in range(self.batch)]

    @property
    def free_pages(self) -> int:
        return int(self._lib.pa_free_pages(self._h))

    @property
    def cached_pages(self) -> int:
        return int(self._lib.pa_cached_pages(self._h))

    @property
    def hit_tokens(self) -> int:
        return int(self._lib.pa_hit_tokens(self._h))

    def slot_npages(self, s: int) -> int:
        return int(self._lib.pa_slot_npages(self._h, s))

    # ------------------------------------------------------------- core
    def grow(self, s: int, n_tokens: int) -> bool:
        return bool(self._lib.pa_grow_slot(self._h, s, n_tokens))

    def release(self, s: int) -> None:
        self._lib.pa_release_slot(self._h, s)

    def attach(self, s: int, tokens, adapter: int = -1) -> int:
        arr = np.ascontiguousarray(tokens, np.int32)
        return int(self._lib.pa_attach_prefix(
            self._h, s, arr.ctypes.data_as(self._lib._pa_tok_ptr),
            len(arr), adapter))

    def register(self, s: int, tokens, adapter: int = -1) -> None:
        arr = np.ascontiguousarray(tokens, np.int32)
        self._lib.pa_register_prefix(
            self._h, s, arr.ctypes.data_as(self._lib._pa_tok_ptr),
            len(arr), adapter)


def make_allocator(backend: str, n_pages: int, page: int, batch: int,
                   np_max: int, prefix_cache: bool = False):
    """backend: "py" (default reference) or "native" (C++ tier)."""
    cls = {"py": PagedAllocatorPy,
           "native": PagedAllocatorNative}[backend]
    return cls(n_pages, page, batch, np_max, prefix_cache)
