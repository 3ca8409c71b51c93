"""Scale-discipline guard: Ray's native ``Dataset.groupby().aggregate()``
pays O(distinct keys) in driver-side Python (measured 20+ min on the 1.2M
pair keys of ``part_copurchase`` at sf0.1), so it is ONLY allowed on
bounded key domains (brands, nations, event types, calendar units, …).
Anything whose cardinality grows with the corpus must use the
``grouped_agg`` combiner exchange.

This test pins the exact allowlist of native-aggregate sites; a new one
fails the build until it is either justified here (bounded domain) or
rewritten on the combiner."""

import pathlib
import re

import bioie_llm_ray.pipelines.analytics as analytics
import bioie_llm_ray.pipelines.code as code
import bioie_llm_ray.pipelines.kg as kg

# (module, groupby-keys source text) — every entry is a bounded key domain
ALLOWED = {
    ("analytics", '["l_returnflag", "l_linestatus"]'),  # 3×2 flags
    ("analytics", '"p_brand"'),  # 25 brands
    ("analytics", '"n_name"'),  # 25 nations
    ("analytics", '"event_type"'),  # 5 types
    ("analytics", '"lang"'),  # handful of languages
    ("analytics", '"n_orders"'),  # per-customer order-count histogram bins
    ("analytics", '"channel"'),  # 2 attribution channels
    ("analytics", '"decile"'),  # 10
    ("analytics", '"bin"'),  # 10 calibration bins
    ("analytics", '"o_orderpriority"'),  # 5 priorities
    ("analytics", '["true_lang", "detected_lang"]'),  # langs²
    ("analytics", '"segment"'),  # 4 RFM segments
    ("analytics", '"digit"'),  # 9 Benford digits
    ("analytics", '["true_lang", "pred_lang"]'),  # langs²
    ("analytics", '"o_year"'),  # calendar years
    ("analytics", '["n_name", "o_year"]'),  # nations × years
    ("analytics", '["p_brand", "p_size"]'),  # 25 × 50
    ("analytics", '["bag", "r"]'),  # n_subsets × n_resamples (BLB)
    ("analytics", '"d"'),  # calendar days in the window
    ("analytics", '["source", "lang"]'),  # sources × langs
    ("kg", '"pred"'),  # relation vocabulary
}

_PAT = re.compile(r"\.groupby\(([^)]{0,100}?)\)\s*(?:\n\s*)?\.aggregate\(", re.S)


def _sites(mod):
    src = pathlib.Path(mod.__file__).read_text()
    return {m.group(1).strip() for m in _PAT.finditer(src)}


def test_native_aggregate_sites_are_allowlisted():
    found = {
        ("analytics", k) for k in _sites(analytics)
    } | {("code", k) for k in _sites(code)} | {("kg", k) for k in _sites(kg)}
    new = found - ALLOWED
    assert not new, (
        "new native Dataset.aggregate site(s) with un-reviewed key domains "
        f"(bounded? use the grouped_agg combiner otherwise): {sorted(new)}"
    )
