"""MurmurHash3 x64 128-bit, bit-parity with the reference's hash substrate.

The reference hashes every item with ``murmur3.SeedSum128(9001, 9001, bytes)``
(hll/hll_sketch.go:367-369, seed constant internal/utils.go:33) and uses the
64-bit variant ``murmur3.SeedSum64(9001, bytes)`` (== h1 of the 128-bit hash)
for frequent-items keys (frequencies/items_sketch_test.go:34-37).

Two implementations:

* ``murmur3_128(data, seed)`` — scalar, arbitrary byte strings. Used for
  golden vectors and per-item paths.
* ``murmur3_128_u64`` / ``murmur3_128_bytes_batch`` — numpy-vectorized over
  many inputs at once (the hot path inside ``map_batches``). uint64
  arithmetic wraps mod 2^64 which is exactly the semantics required.

Also provides ``fmix64`` — murmur3's 64-bit finalizer, the same xor-shift /
multiply avalanche the reference uses as a cheap re-hash
(frequencies/utils.go:57-68); we use it for MinHash permutations and band
salting.
"""

from __future__ import annotations

import numpy as np

DEFAULT_UPDATE_SEED = 9001  # internal/utils.go:33

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_M = (1 << 64) - 1

_C1_U = np.uint64(_C1)
_C2_U = np.uint64(_C2)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix64_scalar(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> tuple[int, int]:
    """Scalar MurmurHash3 x64 128-bit; returns (h1, h2) as python ints."""
    length = len(data)
    h1 = seed & _M
    h2 = seed & _M
    nblocks = length // 16
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M
        h1 = (h1 * 5 + 0x52DCE729) & _M
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M
        h2 = (h2 * 5 + 0x38495AB5) & _M

    tail = data[nblocks * 16 :]
    ntail = len(tail)
    k1 = 0
    k2 = 0
    if ntail > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _M
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M
        h2 ^= k2
    if ntail > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _M
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M
        h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    h1 = _fmix64_scalar(h1)
    h2 = _fmix64_scalar(h2)
    h1 = (h1 + h2) & _M
    h2 = (h2 + h1) & _M
    return h1, h2


def murmur3_64(data: bytes, seed: int = DEFAULT_UPDATE_SEED) -> int:
    """SeedSum64 == h1 of the 128-bit hash (twmb/murmur3 semantics)."""
    return murmur3_128(data, seed)[0]


# ---------------------------------------------------------------------------
# Vectorized kernels
# ---------------------------------------------------------------------------

def _rotl_v(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def fmix64(k: np.ndarray) -> np.ndarray:
    """Vectorized murmur3 64-bit finalizer (frequencies/utils.go:57-68)."""
    k = k.astype(np.uint64, copy=True)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xFF51AFD7ED558CCD)
    k ^= k >> np.uint64(33)
    k *= np.uint64(0xC4CEB9FE1A85EC53)
    k ^= k >> np.uint64(33)
    return k


def murmur3_128_u64(values: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3-128 of 8-byte little-endian encodings of uint64s.

    Bit-parity with ``UpdateUInt64``'s scratch-buffer hash
    (hll/hll_sketch.go:274-283): an 8-byte input hits only the tail path.
    Returns (h1, h2) uint64 arrays.
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    h1 = np.full(v.shape, np.uint64(seed), dtype=np.uint64)
    h2 = np.full(v.shape, np.uint64(seed), dtype=np.uint64)
    # tail: ntail == 8 -> only k1 path
    k1 = v * _C1_U
    k1 = _rotl_v(k1, 31)
    k1 = k1 * _C2_U
    h1 = h1 ^ k1
    h1 = h1 ^ np.uint64(8)
    h2 = h2 ^ np.uint64(8)
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def murmur3_128_mat(mat: np.ndarray, lengths: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3-128 over n variable-length byte rows.

    ``mat`` is an (n, maxlen_padded) uint8 array (rows zero-padded on the
    right; maxlen_padded need not be a multiple of 16 but extra columns are
    ignored past each row's length); ``lengths`` the true byte length per
    row. Vectorizes the block loop across rows with masks. Returns (h1, h2).
    """
    n, padded = mat.shape
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    lengths = np.asarray(lengths, dtype=np.int64)
    h1 = np.full(n, np.uint64(seed), dtype=np.uint64)
    h2 = np.full(n, np.uint64(seed), dtype=np.uint64)

    maxlen = int(lengths.max()) if n else 0
    nblocks_max = maxlen // 16
    if padded < nblocks_max * 16 + 16:
        mat = np.ascontiguousarray(
            np.pad(mat, ((0, 0), (0, nblocks_max * 16 + 16 - padded)))
        )
    # view rows as uint64 words
    words = mat[:, : (mat.shape[1] // 8) * 8].view(np.uint64).reshape(n, -1)

    for blk in range(nblocks_max):
        mask = lengths >= (blk + 1) * 16
        if not mask.any():
            break
        k1 = words[:, blk * 2] * _C1_U
        k1 = _rotl_v(k1, 31)
        k1 = k1 * _C2_U
        nh1 = h1 ^ k1
        nh1 = _rotl_v(nh1, 27)
        nh1 = nh1 + h2
        nh1 = nh1 * np.uint64(5) + np.uint64(0x52DCE729)
        k2 = words[:, blk * 2 + 1] * _C2_U
        k2 = _rotl_v(k2, 33)
        k2 = k2 * _C1_U
        nh2 = h2 ^ k2
        nh2 = _rotl_v(nh2, 31)
        nh2 = nh2 + nh1
        nh2 = nh2 * np.uint64(5) + np.uint64(0x38495AB5)
        h1 = np.where(mask, nh1, h1)
        h2 = np.where(mask, nh2, h2)

    # tail: gather up to 15 bytes after the last full block of each row
    tail_start = (lengths // 16) * 16
    ntail = lengths - tail_start
    k1 = np.zeros(n, dtype=np.uint64)
    k2 = np.zeros(n, dtype=np.uint64)
    rows = np.arange(n)
    for i in range(15):
        m = ntail > i
        if not m.any():
            break
        idx = np.minimum(tail_start + i, mat.shape[1] - 1)
        byte = mat[rows, idx].astype(np.uint64)
        byte = np.where(m, byte, np.uint64(0))
        if i < 8:
            k1 |= byte << np.uint64(8 * i)
        else:
            k2 |= byte << np.uint64(8 * (i - 8))

    m2 = ntail > 8
    if m2.any():
        t2 = k2 * _C2_U
        t2 = _rotl_v(t2, 33)
        t2 = t2 * _C1_U
        h2 = np.where(m2, h2 ^ t2, h2)
    m1 = ntail > 0
    if m1.any():
        t1 = k1 * _C1_U
        t1 = _rotl_v(t1, 31)
        t1 = t1 * _C2_U
        h1 = np.where(m1, h1 ^ t1, h1)

    ulen = lengths.astype(np.uint64)
    h1 = h1 ^ ulen
    h2 = h2 ^ ulen
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = fmix64(h1)
    h2 = fmix64(h2)
    h1 = h1 + h2
    h2 = h2 + h1
    return h1, h2


def hash_strings(strings, seed: int = DEFAULT_UPDATE_SEED) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized murmur3-128 of UTF-8 byte images of many strings.

    Mirrors ``UpdateString``'s zero-copy UTF-8 hashing
    (hll/hll_sketch.go:291-295). ``strings`` may be a list of str/bytes or a
    pyarrow StringArray. Returns (h1, h2) uint64 arrays.
    """
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if not isinstance(strings, pa.Array):
        # Python list path (golden vectors, small driver-side lists):
        # canonicalize to an Arrow array once, then share the buffer path.
        seq = list(strings)
        if seq and isinstance(seq[0], (bytes, bytearray, memoryview)):
            strings = pa.array([bytes(s) for s in seq],
                               type=pa.large_binary())
        else:
            strings = pa.array(seq, type=pa.large_string())
    arr = strings
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64)
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        odt = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        odt = np.int64
    else:
        raise TypeError(f"hash_strings expects a (large_)string/binary "
                        f"column, got {t}")
    # Build the padded byte matrix straight from the Arrow value buffer +
    # offsets — one vectorized scatter, no per-row Python (same discipline
    # as stages/lsh._digest_matrix). UTF-8 value bytes are exactly what
    # UpdateString hashes (hll/hll_sketch.go:291-295).
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    vals = np.frombuffer(arr.buffers()[2], dtype=np.uint8) \
        if arr.buffers()[2] is not None else np.empty(0, dtype=np.uint8)
    lengths = np.diff(offs)
    if arr.null_count:
        lengths = np.where(np.asarray(arr.is_null()), 0, lengths)
    maxlen = int(lengths.max())
    padded = ((maxlen // 16) + 1) * 16
    mat = np.zeros((n, padded), dtype=np.uint8)
    total = int(lengths.sum())
    if total:
        # Chunk the scatter over row ranges so the index temporaries stay
        # ~8M elements regardless of total bytes — the single-shot form
        # allocates several total-sized int64 arrays (gigabytes for a
        # block of long texts) and stalls superlinearly on allocation.
        flat = mat.ravel()
        cum = np.concatenate(([0], np.cumsum(lengths)))
        chunk_rows = max(1, int(8_000_000 // max(total // n, 1)))
        ar_full = np.arange(min(total, chunk_rows * maxlen + maxlen),
                            dtype=np.int64)
        rows_full = np.arange(n, dtype=np.int64) * padded
        for r0 in range(0, n, chunk_rows):
            r1 = min(r0 + chunk_rows, n)
            lens_c = lengths[r0:r1]
            tot_c = int(cum[r1] - cum[r0])
            if tot_c == 0:
                continue
            ar = ar_full[:tot_c]
            rel = cum[r0:r1] - cum[r0]
            dst = ar + np.repeat(rows_full[r0:r1] - rel, lens_c)
            if int(offs[r1] - offs[r0]) == tot_c:
                # dense offsets (no gaps): the chunk's source bytes are
                # one contiguous slice — no gather needed
                chunk_vals = vals[int(offs[r0]): int(offs[r0]) + tot_c]
            else:
                chunk_vals = vals[ar + np.repeat(offs[r0:r1] - rel,
                                                 lens_c)]
            flat[dst] = chunk_vals
    return murmur3_128_mat(mat, lengths, seed)
