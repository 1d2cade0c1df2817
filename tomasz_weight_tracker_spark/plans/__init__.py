"""Query catalog: every implemented operator exposed as a (spark
query, DuckDB oracle SQL) pair — the reference's own cross-engine
verification pattern (SURVEY.md §5.1.1), industrialized.
"""

from .catalog import REGISTRY, Query, load  # noqa: F401
from . import llm_ops  # noqa: F401  (registers documents/embeddings queries)
from . import extended  # noqa: F401  (as-of, rollup, resample, G4/T8/G5)
from . import tpch_full  # noqa: F401  (TPC-H shape completion Q2..Q21)
from . import pipeline_text  # noqa: F401  (corpus curation: repetition, PII, contamination)
from . import scale_ops  # noqa: F401  (HLL sketch, stratified sample, z-order, streaming dedup)
from . import python_api  # noqa: F401  (applyInPandas, pandas UDAF, Python UDTF)
from . import pathbound  # noqa: F401  (W1/W2/W4 pipelines gate-embedded via derived inputs)
from . import advanced  # noqa: F401  (SCD2, PageRank, sorted-neighborhood, bitmap distinct)
from . import round6  # noqa: F401  (span dedup, bucketed join, partition-pruned scan)
from . import round7  # noqa: F401  (paged source gate, BPE vocab training)
from . import round8  # noqa: F401  (star-edge dedup, sparse perceptron, media phash)
from . import round8b  # noqa: F401  (passage spans, PQ recall audit, BPE corpus tokens)
from . import round8c  # noqa: F401  (source leakage matrix, fertility, Gopher rules)
from . import round9  # noqa: F401  (maximal passage spans, IVFADC autotune)
from . import round10  # noqa: F401  (S2/S8/S12 gate closure, URL dedup)
from . import round10b  # noqa: F401  (keep-best dedup, line scrub, bitext mining, JSONL)
from . import round11  # noqa: F401  (IVF bitext mining, LSH keep-best)
from . import round12  # noqa: F401  (trained-quantizer bitext, IVF recall audit)
