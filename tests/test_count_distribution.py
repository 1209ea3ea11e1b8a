"""grouped_count_distribution vs a brute single-process oracle,
including the zero-count bucket, across >=2 partitionings."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest


def _ds(tbl, blocks):
    import ray.data

    return ray.data.from_arrow(tbl).repartition(blocks)


@pytest.mark.parametrize("blocks,total", [(1, None), (4, 60), (3, 40)])
def test_grouped_count_distribution(ray_session, blocks, total):
    from apache_datasketches_go_ray.stages.relational import (
        grouped_count_distribution,
    )

    rng = np.random.default_rng(9)
    keys = rng.integers(0, 40, 500).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys),
                    "junk": pa.array(keys * 2)})
    got = grouped_count_distribution(_ds(tbl, blocks), "k",
                                     total_keys=total,
                                     num_partitions=3).to_pandas()
    per_key = Counter(keys.tolist())
    want = Counter(per_key.values())
    if total is not None:
        zero = total - len(per_key)
        if zero > 0:
            want[0] = zero
    got_map = {int(r.cnt): int(r.n_keys) for r in got.itertuples()}
    assert got_map == dict(want)
    assert len(got) == len(got_map)
