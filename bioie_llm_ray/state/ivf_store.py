"""IVF index as a partition-pruned Parquet layout.

The scale path for approximate nearest-neighbor over a persistent corpus:
pay the quantize-and-partition cost ONCE at ingest (like the hash-bucketed
store pays its shuffle once), then every query batch READS ONLY the
``n_probe`` list partitions it probes — at 100 TB with 1024 lists and
n_probe=8, a query touches <1% of the bytes, enforced by the storage
layout rather than an in-memory filter.

- ``build_ivf_store``: deterministic ``distributed_kmeans`` quantizer →
  one streaming pass assigns each vector its list id → partitioned write
  (``list=<i>/`` dirs) + the centroid matrix in ``_IVF.json``.
- ``ivf_store_topk``: probe lists per query from the stored centroids,
  read ONLY those partitions, exact cosine within them — identical
  results to the in-memory ``similarity.ivf_probed_topk`` over the same
  corpus (same quantizer, probes, and tie-breaks), which is what the
  SQL oracle checks.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import ray

from ..stages.similarity import _merge_topk, _normalize, distributed_kmeans
from .fs import isdir, join, listdir, ray_fs, resolve

_META = "_IVF.json"


def build_ivf_store(
    ds: ray.data.Dataset,
    path: str,
    n_centroids: int = 16,
    n_iters: int = 3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    filesystem=None,
) -> np.ndarray:
    """Quantize, partition by list id, persist centroids.  Returns the
    centroid matrix.  ``path`` may be a local path, a ``file://``-style
    URI, or any fsspec URI paired with ``filesystem=`` (see ``state.fs``)."""
    cent = distributed_kmeans(
        ds, k=n_centroids, n_iters=n_iters, emb_col=emb_col, id_col=id_col
    )
    ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        x = np.stack(
            batch[emb_col].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=-1)
        return batch.append_column(
            "list", pa.array(np.argmin(d2, axis=1).astype(np.int64))
        )

    fs, root = resolve(path, filesystem)
    fs.makedirs(root, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        root, partition_cols=["list"], filesystem=ray_fs(fs)
    )
    with fs.open(join(root, _META), "w") as f:
        json.dump(
            {"centroids": cent.tolist(), "emb_col": emb_col, "id_col": id_col},
            f,
        )
    return cent


def ivf_store_topk(
    path: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    n_probe: int = 4,
    exclude_self: bool = True,
    filesystem=None,
) -> pa.Table:
    """Search the store reading ONLY the probed list partitions."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    emb_col, id_col = meta["emb_col"], meta["id_col"]

    q = np.asarray(queries, dtype=np.float64)
    d2q = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=-1)
    probes = np.argsort(d2q, axis=1, kind="stable")[:, :n_probe]
    qn = _normalize(q)
    needed = sorted({int(li) for row in probes for li in row})
    # storage-enforced pruning with ONE Dataset over every probed list
    # partition (per-partition datasets cost O(probed lists) driver
    # overhead at wide probe sets)
    files = []
    for li in needed:
        d = join(root, f"list={li}")
        if not isdir(fs, d):
            continue
        files.extend(
            join(d, f) for f in listdir(fs, d) if f.endswith(".parquet")
        )
    if not files:
        return _merge_topk([], query_ids, k, exclude_self)
    # partition identity via include_paths (ground truth from storage;
    # also avoids re-paying the O(rows × k × dim) distance temp at query
    # time that in-task re-quantization would cost)
    ds = ray.data.read_parquet(
        files,
        columns=[id_col, emb_col],
        include_paths=True,
        filesystem=ray_fs(fs),
    )
    probe_ref = ray.put(probes)
    q_ref = ray.put(qn)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        pr = ray.get(probe_ref)
        qm = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        emb = _normalize(
            np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        pcodes = _pc.dictionary_encode(batch["path"].combine_chunks())
        codes = np.asarray(pcodes.indices.to_numpy(zero_copy_only=False))
        uniq = pcodes.dictionary.to_pylist()
        ul = np.empty(len(uniq), dtype=np.int64)
        for i, pth in enumerate(uniq):
            ul[i] = int(
                next(x for x in pth.split("/") if x.startswith("list="))[5:]
            )
        lists = ul[codes]
        out_q, out_n, out_s = [], [], []
        for qi in range(len(qm)):
            mask = np.isin(lists, pr[qi])
            if not mask.any():
                continue
            row = qm[qi] @ emb[mask].T
            sub_ids = ids[mask]
            kk = min(k + (1 if exclude_self else 0), len(row))
            if kk < len(row):
                seed_idx = np.argpartition(-row, kk - 1)[:kk]
                idx = np.flatnonzero(row >= row[seed_idx].min())
                idx = idx[np.lexsort((sub_ids[idx], -row[idx]))][:kk]
            else:
                idx = np.arange(len(row))
            for j in idx:
                out_q.append(qi)
                out_n.append(int(sub_ids[j]))
                out_s.append(float(row[j]))
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int32()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    return _merge_topk(partials, query_ids, k, exclude_self)
