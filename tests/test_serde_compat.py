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
