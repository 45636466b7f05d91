"""Vectorized Jaro-Winkler similarity (Winkler 1990, public formula).

The flagship scorer's string-similarity kernel. Round-1 used a per-pair
Python character loop (~25k pairs/s/core — the measured bottleneck of the
headline turns-scored/sec metric). This module replaces it with a numpy
**bit-parallel batch kernel** over the whole Arrow batch:

  * each string (truncated to `JW_MAXLEN` = 64 chars) becomes a row of an
    (n, 64) int32 codepoint matrix — one bulk utf-32 encode per batch,
    no per-row Python;
  * for every row, B's character positions are packed into uint64
    bitmasks (`PM[row, char]`), so the classic greedy Jaro matching step
    "first unmatched j inside the window with b[j]==a[i]" collapses to
    `lowest_set_bit(PM[a_i] & window_mask & ~matched)` — three uint64 ops
    on length-n arrays per character position (the same position-mask idea
    rapidfuzz uses in C++, re-derived in numpy);
  * transpositions come from comparing the matched subsequences, extracted
    with a stable argsort over the match bitmasks.

Cost: O(64) numpy ops over (n,) uint64 arrays per batch instead of
O(L²) interpreted Python per pair — measured ~87k pairs/s/core vs ~25k
for the loop (tools/bench_scoring.py), and it vectorizes over arbitrarily
large Arrow batches.

Exactness: the kernel is fuzz-verified **bit-identical** to DuckDB's
`jaro_winkler_similarity` (same greedy matching, integer-halved
transpositions, 0.7 boost threshold, prefix ≤ 4, p = 0.1, and 0.0 for two
empty strings), which is what lets the `pair_jaro_winkler` query pass the
driver's value-hash oracle gate. Strings longer than 64 chars are
truncated before comparison (JW is a short-string measure — Winkler's
prefix boost assumes the discriminating signal is at the front); the
DuckDB oracle applies the same `substr(·, 1, 64)`.

DuckDB's implementation compares **UTF-8 byte sequences**, so rows
containing codepoints > U+00FF (impossible for `norm_text`, which is
[a-z0-9 ] by construction — functions/normalize.py) fall back to the
scalar reference implementation `jaro_winkler_py`, which applies the same
byte-level semantics (char-truncate to 64, then compare UTF-8 bytes).

Reference analog: string similarity feeding pairwise scores stands in for
the local-compatibility scorer of
`/root/reference/src/md/MentionDetection.java:264-288` (cosine) combined
per north_star with the logistic combiner (operators/scoring.py).
"""

from __future__ import annotations

import numpy as np

JW_MAXLEN = 64  # JW compare window; oracle applies substr(·,1,64) to match
_PAD = 256  # codepoint pad; PM column 256 is never populated -> no match
_ALL1 = np.uint64(0xFFFFFFFFFFFFFFFF)
_ONE = np.uint64(1)

P_WEIGHT = 0.1  # Winkler prefix weight
MAX_PREFIX = 4
BOOST_THRESHOLD = 0.7


def _popcount64(x: np.ndarray) -> np.ndarray:
    """SWAR popcount for uint64 arrays (numpy < 2 has no bitwise_count)."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x = x - ((x >> _ONE) & m1)
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * h01) >> np.uint64(56)).astype(np.int64)


def _encode(strs: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Truncated strings -> ((n, JW_MAXLEN) int32 codepoints padded with
    _PAD, per-row lengths, rows containing codepoints > 255). One bulk
    utf-32 encode for the whole batch."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32).astype(
        np.int32
    )
    offs = np.concatenate(([0], np.cumsum(lens[:-1]))) if n else np.zeros(0, np.int64)
    M = np.full((n, JW_MAXLEN), _PAD, dtype=np.int32)
    grid = offs[:, None] + np.arange(JW_MAXLEN)[None, :]
    valid = np.arange(JW_MAXLEN)[None, :] < lens[:, None]
    M[valid] = flat[grid[valid]]
    # rows with any non-ascii codepoint take the scalar byte-semantics
    # fallback (UTF-8 multi-byte chars make byte != codepoint comparison)
    big = (np.where(valid, M, 0) > 127).any(axis=1)
    return M, lens, big


def _jw_kernel(
    A: np.ndarray, B: np.ndarray, la: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Batched Jaro-Winkler over encoded rows (all la>0, lb>0, latin-1)."""
    n = A.shape[0]
    rows = np.arange(n)
    # position-mask table: PM[r, c] = bitmask of positions j where B[r,j]==c
    PM = np.zeros((n, 257), dtype=np.uint64)
    for j in range(int(lb.max())):
        m = j < lb
        PM[rows[m], B[m, j]] |= _ONE << np.uint64(j)
    win = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    fb = np.zeros(n, dtype=np.uint64)  # matched B positions
    fa = np.zeros(n, dtype=np.uint64)  # matched A positions
    for i in range(int(la.max())):
        lo = np.maximum(i - win, 0).astype(np.uint64)
        hi = np.minimum(i + win, lb - 1)
        wm = (_ALL1 >> (np.uint64(63) - hi.astype(np.uint64))) & ~(
            (_ONE << lo) - _ONE
        )
        wm = np.where(hi >= lo.astype(np.int64), wm, np.uint64(0))
        cand = PM[rows, A[:, i]] & wm & ~fb
        first = cand & (~cand + _ONE)  # lowest set bit = greedy first j
        fb |= first
        fa |= np.where(cand != 0, _ONE << np.uint64(i), np.uint64(0))
    m = _popcount64(fb)
    # transpositions: compare matched subsequences (stable extraction)
    fa_bits = np.unpackbits(
        fa.view(np.uint8).reshape(n, 8), axis=1, bitorder="little"
    ).astype(bool)
    fb_bits = np.unpackbits(
        fb.view(np.uint8).reshape(n, 8), axis=1, bitorder="little"
    ).astype(bool)
    a_seq = np.take_along_axis(A, np.argsort(~fa_bits, axis=1, kind="stable"), axis=1)
    b_seq = np.take_along_axis(B, np.argsort(~fb_bits, axis=1, kind="stable"), axis=1)
    k = np.arange(JW_MAXLEN)
    t = ((a_seq != b_seq) & (k[None, :] < m[:, None])).sum(axis=1) // 2
    msafe = np.maximum(m, 1)
    j3 = np.where(m == 0, 0.0, (m / la + m / lb + (m - t) / msafe) / 3.0)
    pref = np.cumprod(
        (A[:, :MAX_PREFIX] == B[:, :MAX_PREFIX]) & (A[:, :MAX_PREFIX] != _PAD), axis=1
    ).sum(axis=1)
    return np.where(
        j3 > BOOST_THRESHOLD, j3 + pref * P_WEIGHT * (1.0 - j3), j3
    )


def jaro_winkler_batch(a_strs, b_strs) -> np.ndarray:
    """Jaro-Winkler for two same-length sequences of strings (None -> "").
    Returns float64 array; bit-identical to DuckDB jaro_winkler_similarity
    applied to the 64-char-truncated inputs."""
    n = len(a_strs)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    a_t = [(s or "")[:JW_MAXLEN] for s in a_strs]
    b_t = [(s or "")[:JW_MAXLEN] for s in b_strs]
    eq = np.fromiter((x == y for x, y in zip(a_t, b_t)), dtype=bool, count=n)
    A, la, big_a = _encode(a_t)
    B, lb, big_b = _encode(b_t)
    out[eq & (la > 0)] = 1.0  # equal non-empty; jw("","") = 0.0 per DuckDB
    big = big_a | big_b
    live = ~eq & ~big & (la > 0) & (lb > 0)
    idx = np.nonzero(live)[0]
    if len(idx):
        out[idx] = _jw_kernel(A[idx], B[idx], la[idx], lb[idx])
    for i in np.nonzero(big & ~eq)[0]:  # rare non-latin1 rows: scalar path
        out[i] = jaro_winkler_py(a_t[i], b_t[i])
    return out


# ---------------------------------------------------------------------------
# Scalar reference implementation (tests + non-latin1 fallback)
# ---------------------------------------------------------------------------


def _jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    fa = [False] * la
    fb = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not fb[j] and a[i] == b[j]:
                fa[i] = fb[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    j = 0
    for i in range(la):
        if fa[i]:
            while not fb[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3.0


def jaro_winkler_py(a: str, b: str) -> float:
    """Scalar Jaro-Winkler with DuckDB semantics: truncate to JW_MAXLEN
    *characters*, then compare the UTF-8 *byte* sequences (DuckDB operates
    on bytes; for ascii input bytes == chars). jw("","") = 0.0 per DuckDB."""
    a, b = (a or "")[:JW_MAXLEN], (b or "")[:JW_MAXLEN]
    if a == b:
        return 1.0 if a else 0.0
    if not (a.isascii() and b.isascii()):
        # byte-level comparison: latin-1 round-trip maps each UTF-8 byte
        # to one comparable "character"
        a = a.encode("utf-8").decode("latin-1")
        b = b.encode("utf-8").decode("latin-1")
    j = _jaro(a, b)
    if j <= BOOST_THRESHOLD:
        return j
    prefix = 0
    for x, y in zip(a[:MAX_PREFIX], b[:MAX_PREFIX]):
        if x != y:
            break
        prefix += 1
    return j + prefix * P_WEIGHT * (1.0 - j)


def jaro_winkler_max_batch(a_strs, b_lists) -> np.ndarray:
    """For each row i: max_j jaro_winkler(a_strs[i], b_lists[i][j]) — the
    one-vs-many kernel the Monge-Elkan scorer needs (operators/
    scoring.py:monge_elkan). Empty candidate lists yield 0.0.

    Shape: flatten the ragged candidate lists once (np.concatenate over
    the Arrow-provided per-row arrays — the qualclf segment-kernel
    discipline), np.repeat the left strings to align, ONE
    `jaro_winkler_batch` call over the flattened cross product, then a
    single `np.maximum.reduceat` segment-max — no per-comparison Python."""
    n = len(b_lists)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    counts = np.fromiter((len(b) for b in b_lists), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return out
    flat_b = np.concatenate(
        [np.asarray(b, dtype=object) for b in b_lists if len(b)]
    )
    flat_a = np.repeat(np.asarray(list(a_strs), dtype=object), counts)
    sims = jaro_winkler_batch(flat_a.tolist(), flat_b.tolist())
    nz = counts > 0
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1][nz]
    out[nz] = np.maximum.reduceat(sims, starts)
    return out
