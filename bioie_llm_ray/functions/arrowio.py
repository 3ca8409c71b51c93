"""Arrow interop helpers.

``pa.Table.from_pandas`` attaches a ``b'pandas'`` schema-metadata blob to
every converted table.  In pyarrow 16 a schema carrying that blob raises
``unhashable type: 'dict'`` from ``hash(schema)``, which defeats Ray Data's
block-schema deduplication (``transform_pyarrow.unify_schemas``) and spams
``Failed to hash the schemas`` warnings from every downstream sort/shuffle
worker that touches such a block.  Every pandas→Arrow conversion whose
output re-enters a Ray pipeline must go through ``from_pandas_clean``;
reads pass a metadata-stripped schema to ``read_parquet`` for the same
reason (``pipelines.analytics._clean_schema``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def from_pandas_clean(df: "pd.DataFrame", **kwargs) -> pa.Table:
    """``pa.Table.from_pandas(preserve_index=False)`` minus the pandas
    schema-metadata blob (hashable schema ⇒ Ray block-schema dedup works)."""
    kwargs.setdefault("preserve_index", False)
    return pa.Table.from_pandas(df, **kwargs).replace_schema_metadata(None)
