import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    # engine shuffles rely on hash-shuffle strategy
    from apache_datasketches_go_ray.stages.context import ensure_hash_shuffle

    ensure_hash_shuffle()
    yield
    ray.shutdown()
