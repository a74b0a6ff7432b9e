"""Per-partition lineage manifests + checkpoint/resume state.

The reference has NO checkpoint/resume story — re-running its edge build
double-counts weights because Neo4j ``ON MATCH weight+=1`` is applied per
observation with no run/evidence dedup
(`/root/reference/src/database/graph_database.py:196-197`; SURVEY.md §4.4).
This package replaces that with deterministic recompute-per-partition:
narrow-chain outputs are written per input partition with a lineage
manifest, resume skips partitions whose manifest validates, and the final
wide aggregations are ALWAYS recomputed from the surviving partials so a
resumed run can never double-count.
"""

from .manifests import (  # noqa: F401
    STAGE_VERSIONS,
    PartitionManifest,
    load_manifest,
    manifest_path,
    url_fingerprint,
    validate_manifest,
)
