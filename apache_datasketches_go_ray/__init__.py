"""Ray-Data-native transcript near-duplicate detection + clustering engine
(datasketches-parity hash substrate). See SURVEY.md for the blueprint.

Importing the package configures Ray Data's hash-shuffle strategy, which
the engine's key-colocating ``repartition(keys=...)`` shuffles require.
Datasets must be created after this import to pick up the context. The
package never calls ``ray.init``.
"""

from .stages.context import ensure_hash_shuffle as _ensure_hash_shuffle

_ensure_hash_shuffle()


def _tune_malloc() -> None:
    """Serve large numpy buffers from the reused brk heap instead of fresh
    mmaps. On this class of VM a first-touch page fault costs ~20us/page,
    so every fresh multi-MB mmap'd buffer pays ~1s before any compute;
    keeping the pages in the heap makes the second allocation onward
    ~100x faster. Applied in every process that imports the package
    (driver and Ray workers alike). No-op off glibc."""
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD: 1 GiB
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD: keep freed pages
    except Exception:
        pass


_tune_malloc()

from .config import DedupConfig  # noqa: E402,F401


def run_dedup(*args, **kwargs):  # noqa: E402
    """Convenience re-export: pipelines.dedup.run_dedup (lazy import so
    `import apache_datasketches_go_ray` stays cheap)."""
    from .pipelines.dedup import run_dedup as _run

    return _run(*args, **kwargs)


def run_curate(*args, **kwargs):  # noqa: E402
    """Convenience re-export: pipelines.curate.run_curate."""
    from .pipelines.curate import run_curate as _run

    return _run(*args, **kwargs)
