"""plakar_ray — a Ray-Data-native content-defined-chunking dedup + near-dup engine.

A brand-new engine (NOT a port) with the query/data-processing capabilities of
the reference library PlakarKorp/go-cdc-chunkers (see /root/reference):

- CDC algorithm family (FastCDC legacy/v1.0.0/keyed, UltraCDC legacy/v1.0.0,
  JC legacy/v1.0.0/v1.1.0, FastCDC4Stadia, fixed) with byte-exact chunk
  boundaries vs the Go reference (golden + differential tests).
- Dedup analytics (analyze / compare / resync) lifted to distributed Ray Data
  pipelines: groupby-digest shuffles instead of in-memory digest sets.
- Near-duplicate detection & clustering: chunk-digest shingles -> MinHash ->
  LSH band buckets -> candidate pairs -> union-find clusters.
- Training-data ops: exact dedup, SimHash, n-gram Jaccard, embedding
  cosine ANN, language-ID, quality scoring, token counting, fingerprinting.

Library code never calls ray.init()/ray.shutdown(); the caller owns the Ray
session (driver contract, /root/repo/__ray_entry__.py).
"""

from plakar_ray.opts import ChunkerOpts
from plakar_ray.registry import ALGORITHMS, get_algorithm, register_chunker

__all__ = ["ChunkerOpts", "ALGORITHMS", "get_algorithm", "register_chunker"]

__version__ = "0.1.0"
