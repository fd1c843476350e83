"""Driver contract for the graft builder (Ray Data target).

Implementation lives in plakar_ray.entry; this module only re-exports the
three hooks. Ray is initialised by the driver BEFORE importing this module —
neither this module nor the library ever calls ray.init()/ray.shutdown().

queries() covers every operator family from SURVEY.md §2: CDC chunk explode
and analytics (analyze/compare/resync), exact + MinHash/LSH + SimHash dedup,
text analysis (stats/quality/lang-id/tokens/fingerprints), n-gram Jaccard,
windowed/sessionized event aggregates, and embedding similarity search
(brute-force, IVF, hyperplane LSH). oracle_sql() provides DuckDB oracles for
every SQL-expressible query; the rest are value-verified in tests/
(golden byte-parity with the Go reference, recall gates, oracle parity).
"""

from __future__ import annotations

from plakar_ray.entry import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
