"""Ray-Data-native transcript near-duplicate detection + clustering engine
(datasketches-parity hash substrate). See SURVEY.md for the blueprint.

Importing the package configures Ray Data's hash-shuffle strategy, which
the engine's key-colocating ``repartition(keys=...)`` shuffles require.
Datasets must be created after this import to pick up the context. The
package never calls ``ray.init``.
"""

from .stages.context import ensure_hash_shuffle as _ensure_hash_shuffle

_ensure_hash_shuffle()

from .config import DedupConfig  # noqa: E402,F401
