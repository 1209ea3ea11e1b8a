"""Cross-language golden-file parity for KLL and frequencies.

Mirrors the reference's Java-compat suites — the same golden bytes, the
same assertions (frequencies/sketch_serialization_test.go:140-244,
kll/items_sletch_serialization_test.go:48-95) — plus stronger
rank-accuracy checks that the known uniform input makes possible.
No Ray needed: these exercise the serde kernels only.
"""

import os

import pytest

from apache_datasketches_go_ray.state.serde_compat import (
    int_to_fixed_length_string,
    num_digits,
    read_frequencies_items_string,
    read_frequencies_longs,
    read_kll_string,
)
from apache_datasketches_go_ray.state.kll import normalized_rank_error

JAVA = "/root/reference/serialization_test_data/java_generated_files"
N_ARR = [0, 1, 10, 100, 1000, 10000, 100000, 1000000]


def _load(name: str) -> bytes:
    path = os.path.join(JAVA, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {name}")
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("n", N_ARR)
def test_frequencies_longs_java_parity(n):
    # Java built these with maxMapSize=64 over items 1..n each weight 1.
    sk = read_frequencies_longs(_load(f"frequent_long_n{n}_java.sk"))
    assert sk.is_empty == (n == 0)
    assert sk.stream_length == n
    if n > 10:
        assert sk.get_maximum_error() > 0
    else:
        assert sk.get_maximum_error() == 0
    # counter bound: 0.75 * 64 active cells max (longs_sketch.go:61-95)
    assert len(sk.counts) <= 48
    for item, count in sk.counts.items():
        assert 1 <= item <= max(n, 1)
        # true frequency is 1; the epsilon guarantee brackets it
        assert sk.get_lower_bound(item) == count
        assert sk.get_upper_bound(item) >= 1
        assert sk.get_estimate(item) == count + sk.offset


@pytest.mark.parametrize("n", N_ARR)
def test_frequencies_strings_java_parity(n):
    sk = read_frequencies_items_string(_load(f"frequent_string_n{n}_java.sk"))
    assert sk.is_empty == (n == 0)
    assert sk.stream_length == n
    if n > 10:
        assert sk.get_maximum_error() > 0
    else:
        assert sk.get_maximum_error() == 0
    for item in sk.counts:
        assert 1 <= int(item) <= max(n, 1)


def test_frequencies_string_utf8_exact():
    # frequencies/sketch_serialization_test.go:187-218: 7 items, exact
    sk = read_frequencies_items_string(_load("frequent_string_utf8_java.sk"))
    assert not sk.is_empty
    assert sk.get_maximum_error() == 0
    assert sk.stream_length == 28
    expected = {"абвгд": 1, "еёжзи": 2, "йклмн": 3, "опрст": 4,
                "уфхцч": 5, "шщъыь": 6, "эюя": 7}
    for item, est in expected.items():
        assert sk.get_estimate(item) == est


def test_frequencies_string_ascii_exact():
    sk = read_frequencies_items_string(_load("frequent_string_ascii_java.sk"))
    assert not sk.is_empty
    assert sk.get_maximum_error() == 0
    assert sk.stream_length == 10
    for i, ch in enumerate("abcd", start=1):
        assert sk.get_estimate(ch * 29) == i


@pytest.mark.parametrize("n", N_ARR)
def test_kll_string_java_parity(n):
    # Java built these with k=200 over intToFixedLengthString(1..n).
    sk = read_kll_string(_load(f"kll_string_n{n}_java.sk"))
    assert sk.k == 200
    assert sk.is_empty == (n == 0)
    assert sk.is_estimation_mode == (n > 100)
    if n == 0:
        return
    digits = num_digits(n)
    assert sk.min_item == int_to_fixed_length_string(1, digits)
    assert sk.max_item == int_to_fixed_length_string(n, digits)
    # retained-weight conservation: weights must sum exactly to n
    assert sk.total_weight() == n
    # every retained quantile lies within [min, max]
    for q, _ in sk.iter_weighted():
        assert sk.min_item <= q <= sk.max_item
    # rank accuracy on the known uniform input (single-sided normalized
    # rank error for k=200; kll/utils.go:29-36)
    if n >= 1000:
        eps = normalized_rank_error(200, pmf=False)
        for frac in (0.25, 0.5, 0.75):
            item = int_to_fixed_length_string(int(n * frac), digits)
            assert abs(sk.get_rank(item) - frac) <= 2 * eps


# ---------------------------------------------------------------------------
# HLL golden-file parity (hll/hll_sketch_serialization_test.go:69-178)
# ---------------------------------------------------------------------------

CPP = "/root/reference/serialization_test_data/cpp_generated_files"


def _load_any(base: str, name: str) -> bytes:
    path = os.path.join(base, name)
    if not os.path.exists(path):
        pytest.skip(f"golden file missing: {name}")
    with open(path, "rb") as f:
        return f.read()


@pytest.mark.parametrize("src,base", [("java", JAVA), ("cpp", CPP)])
@pytest.mark.parametrize("width", [4, 6, 8])
@pytest.mark.parametrize("n", N_ARR)
def test_hll_golden_estimate(src, base, width, n):
    from apache_datasketches_go_ray.state.serde_compat import read_hll

    sk = read_hll(_load_any(base, f"hll{width}_n{n}_{src}.sk"))
    assert sk.lg_k == 12
    assert sk.is_empty() == (n == 0)
    # same tolerance as the Go cross-compat suite
    assert sk.get_estimate() == pytest.approx(n, rel=0.02, abs=1e-9)


@pytest.mark.parametrize("n", [1000, 10000, 100000, 1000000])
def test_hll_golden_cross_width_identical_registers(n):
    """HLL4/6/8 are encodings of one logical register array
    (hll/cross_counting_test.go) — decoded registers must be identical."""
    import numpy as np

    from apache_datasketches_go_ray.state.serde_compat import read_hll

    regs = {w: read_hll(_load_any(JAVA, f"hll{w}_n{n}_java.sk")).registers
            for w in (4, 6, 8)}
    assert np.array_equal(regs[4], regs[8])
    assert np.array_equal(regs[6], regs[8])


@pytest.mark.parametrize("n", [10, 100, 1000, 100000])
def test_hll_golden_bit_exact_vs_own_build(n):
    """Replaying the generating stream (UpdateUInt64 0..n-1, seed 9001)
    through OUR sketch reproduces the Java wire state bit-for-bit:
    identical registers and identical hipAccum doubles — the strongest
    cross-language check available without writing bytes."""
    import numpy as np

    from apache_datasketches_go_ray.state.hll import HllSketch
    from apache_datasketches_go_ray.state.serde_compat import read_hll

    wire = read_hll(_load_any(JAVA, f"hll8_n{n}_java.sk"))
    own = HllSketch(12)
    for i in range(n):
        own.update_u64(i)
    assert own.mode == wire.mode
    if own.registers is None:
        assert sorted(own.coupons) == sorted(wire.coupons)
    else:
        assert np.array_equal(own.registers, wire.registers)
        assert own.hip_accum == wire.hip_accum
        assert own.kxq0 == wire.kxq0 and own.kxq1 == wire.kxq1
    assert own.get_estimate() == wire.get_estimate()


def test_hll_golden_coupon_modes():
    """n=1 (LIST) and n=100 (SET) files exercise the coupon replay path."""
    from apache_datasketches_go_ray.state.hll import MODE_HLL
    from apache_datasketches_go_ray.state.serde_compat import read_hll

    small = read_hll(_load_any(JAVA, "hll8_n1_java.sk"))
    assert small.mode != MODE_HLL and len(small.coupons) == 1
    mid = read_hll(_load_any(JAVA, "hll8_n100_java.sk"))
    assert mid.mode != MODE_HLL and len(mid.coupons) == 100


# ---------------------------------------------------------------------------
# HLL writer: bit-exact wire images (to_slice_impl.go parity)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("width", [4, 6, 8])
@pytest.mark.parametrize("n", N_ARR)
def test_hll_write_bit_exact_java_and_cpp(width, n):
    """Replaying the generating stream and serializing reproduces BOTH
    reference libraries' bytes exactly: Java convention (compact flag
    clear on HLL_6/8 register images) and C++ (flag set). Covers LIST
    arrival order, the SET open-addressed table layout (probe + grow
    simulation), 6-bit packing, and HLL_4 curMin rebase + aux map."""
    from apache_datasketches_go_ray.state.hll import HllSketch
    from apache_datasketches_go_ray.state.serde_compat import write_hll

    sk = HllSketch(12)
    for i in range(n):
        sk.update_u64(i)
    java = _load_any(JAVA, f"hll{width}_n{n}_java.sk")
    cpp = _load_any(CPP, f"hll{width}_n{n}_cpp.sk")
    assert write_hll(sk, tgt=width, compact=True) == java
    assert write_hll(sk, tgt=width, compact=True, compact_flag=True) == cpp


@pytest.mark.parametrize("width", [4, 6, 8])
@pytest.mark.parametrize("n", [0, 1, 10, 100, 10000, 1000000])
def test_hll_write_read_round_trip(width, n):
    """read_hll(write_hll(sk)) reproduces registers and estimate for
    every mode/width, including HLL_4 whose image rebases on curMin."""
    import numpy as np

    from apache_datasketches_go_ray.state.hll import MODE_HLL, HllSketch
    from apache_datasketches_go_ray.state.serde_compat import (
        read_hll,
        write_hll,
    )

    sk = HllSketch(12)
    for i in range(n):
        sk.update_u64(i)
    back = read_hll(write_hll(sk, tgt=width, compact=True))
    assert back.mode == sk.mode
    if sk.mode == MODE_HLL:
        assert np.array_equal(back.registers, sk.registers)
        assert back.hip_accum == sk.hip_accum
    else:
        assert sorted(back.coupons) == sorted(sk.coupons)
    assert back.get_estimate() == sk.get_estimate()


# ---------------------------------------------------------------------------
# Write-side golden parity: frequencies + KLL vs the Java corpus
# (the reference only claims byte-exact emission for HLL,
# hll/hll_sketch_serialization_test.go:176-252; we extend the same bar to
# the other two families — every Java golden file reproduced bit-for-bit
# from a fresh build with the documented generation stream,
# frequencies/sketch_serialization_test.go:29-131,
# kll/items_sletch_serialization_test.go:28-47)
# ---------------------------------------------------------------------------

from apache_datasketches_go_ray.state.serde_compat import (  # noqa: E402
    FreqCompatSketch,
    KllStringCompatSketch,
    int_to_fixed_length_string,
    num_digits,
    read_kll_string,
    write_frequencies_items_string,
    write_frequencies_longs,
    write_kll_string,
)

_NS = [0, 1, 10, 100, 1000, 10000, 100000, 1000000]


@pytest.mark.parametrize("n", _NS)
def test_frequencies_longs_write_bit_exact_java(n):
    sk = FreqCompatSketch(64, "longs")
    for i in range(1, n + 1):
        sk.update(i)
    assert write_frequencies_longs(sk) == _load(f"frequent_long_n{n}_java.sk")


@pytest.mark.parametrize("n", _NS)
def test_frequencies_string_write_bit_exact_java(n):
    sk = FreqCompatSketch(64, "string")
    for i in range(1, n + 1):
        sk.update(str(i))
    assert write_frequencies_items_string(sk) == \
        _load(f"frequent_string_n{n}_java.sk")


def test_frequencies_string_write_utf8_ascii_bit_exact_java():
    sk = FreqCompatSketch(64, "string")
    for w, s in enumerate(["абвгд", "еёжзи", "йклмн", "опрст", "уфхцч",
                           "шщъыь", "эюя"], 1):
        sk.update(s, w)
    assert write_frequencies_items_string(sk) == \
        _load("frequent_string_utf8_java.sk")
    sk = FreqCompatSketch(64, "string")
    for w, s in enumerate(["a" * 29, "b" * 29, "c" * 29, "d" * 29], 1):
        sk.update(s, w)
    assert write_frequencies_items_string(sk) == \
        _load("frequent_string_ascii_java.sk")


@pytest.mark.parametrize("n", _NS)
def test_kll_string_write_bit_exact_java(n):
    digits = num_digits(n)
    sk = KllStringCompatSketch(200)
    sk.update_many([int_to_fixed_length_string(i, digits)
                    for i in range(1, n + 1)])
    assert write_kll_string(sk) == _load(f"kll_string_n{n}_java.sk")


@pytest.mark.parametrize("n", [0, 1, 10, 1000, 100000])
def test_kll_string_write_read_round_trip(n):
    digits = num_digits(n)
    sk = KllStringCompatSketch(200)
    sk.update_many([int_to_fixed_length_string(i, digits)
                    for i in range(1, n + 1)])
    view = read_kll_string(write_kll_string(sk))
    assert view.n == n
    if n:
        assert view.total_weight() == n
        assert view.min_item == int_to_fixed_length_string(1, digits)
        assert view.max_item == int_to_fixed_length_string(n, digits)


# ---------------------------------------------------------------------------
# frequencies CSV string form (ToString / NewLongsSketchFromString,
# frequencies/longs_sketch.go:176-250,468-485)
# ---------------------------------------------------------------------------

from apache_datasketches_go_ray.state.serde_compat import (  # noqa: E402
    read_frequencies_string_form,
    write_frequencies_string_form,
)


def test_frequencies_string_form_format_pin():
    # TestToString1's small fixture (longs_sketch_test.go:502-506):
    # size 8, weights [1,1,1,1,1,1,1,2,3,4,5] on items 1..11
    sk = FreqCompatSketch(8, "longs")
    for i, w in enumerate([1, 1, 1, 1, 1, 1, 1, 2, 3, 4, 5], 1):
        sk.update(i, w)
    s = write_frequencies_string_form(sk)
    head = s.split(",")[:8]
    # serVer=1, famID=10, lgMaxMapSize=3, flags=0, streamWeight=21,
    # offset (purges happened at size 8), numActive, curMapLen=8
    assert head[0] == "1" and head[1] == "10" and head[2] == "3"
    assert head[3] == "0"
    assert int(head[4]) == 21
    assert int(head[7]) == 8
    assert s.endswith(",")
    # pair region length consistent with numActive
    assert len(s[:-1].split(",")) == 8 + 2 * int(head[6])


@pytest.mark.parametrize("n", [0, 1, 10, 1000, 100000])
def test_frequencies_string_form_round_trip(n):
    sk = FreqCompatSketch(64, "longs")
    for i in range(1, n + 1):
        sk.update(i)
    s = write_frequencies_string_form(sk)
    back = read_frequencies_string_form(s)
    assert back.stream_weight == sk.stream_weight
    assert back.offset == sk.offset
    assert back.hash_map.num_active == sk.hash_map.num_active
    assert len(back.hash_map) == len(sk.hash_map)
    assert dict(back.hash_map.active_in_slot_order()) == \
        dict(sk.hash_map.active_in_slot_order())
    # round-tripped sketch re-serializes to the identical string: pair
    # insertion order == slot order, so the probe layout reproduces
    assert write_frequencies_string_form(back) == s
    # and the binary form of the round-tripped sketch matches too
    assert write_frequencies_longs(back) == write_frequencies_longs(sk)


def test_frequencies_string_form_errors():
    with pytest.raises(ValueError):
        read_frequencies_string_form("")
    with pytest.raises(ValueError):
        read_frequencies_string_form("1,10,6")  # too short
    sk = FreqCompatSketch(8, "longs")
    sk.update(42)
    s = write_frequencies_string_form(sk)
    bad = "9" + s[1:]  # SerVer
    with pytest.raises(ValueError):
        read_frequencies_string_form(bad)
    toks = s[:-1].split(",")
    toks[1] = "11"  # family
    with pytest.raises(ValueError):
        read_frequencies_string_form(",".join(toks) + ",")
