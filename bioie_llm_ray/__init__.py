"""bioie_llm_ray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the query/data-processing capabilities of
boxorange/BioIE-LLM (reference at /root/reference, studied for semantics only)
as streaming ``ray.data.Dataset`` pipelines:

- zero-copy Arrow ``map_batches`` stages for stateless transforms,
- actor pools for stateful stages (mention detection, scoring, linking),
- groupby-aggregate shuffles with salted keys for canonicalization/dedup,
- partitioned Parquet checkpoints with per-partition lineage manifests.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.3.0"
