"""Sign-LSH index as a partition-pruned Parquet layout.

The on-disk counterpart of ``stages/similarity.lsh_topk`` (the scan-side
formulation), and the LSH sibling of ``state/ivf_store``: the classic
multi-table LSH index where EACH BAND IS A HASH TABLE.  The corpus is
written once per band partitioned by ``band=<b>/bval=<v>/`` (space cost
``n_bands`` copies — the standard LSH index trade), and a query reads ONLY
its ``n_bands`` matching (band, band-code) partitions.  At 100 TB with 4
bands of 4 bits, a query touches ~4/16 of one copy — the pruning is
enforced by the storage layout, not an in-memory filter.

Candidates are the union over band tables (a vector sharing two bands is
read twice and deduped at merge), exactly the scan-side rule, so
``lsh_store_topk`` is value-identical to ``lsh_topk`` and certified by the
same end-to-end SQL oracle (``oracle.lsh_topk_sql``).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..stages.similarity import _band_values, _normalize, lsh_signs
from .fs import isdir, join, listdir, ray_fs, resolve

_META = "_LSH.json"


def build_lsh_store(
    ds: ray.data.Dataset,
    path: str,
    n_bits: int = 16,
    n_bands: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    filesystem=None,
) -> None:
    """One streaming pass: band codes per vector, one row per (band,
    vector), partitioned write.  The planes are pure splitmix64 functions
    (``lsh_signs``) so nothing but the shape parameters needs persisting."""
    dim = len(ds.limit(1).take_all()[0][emb_col])
    signs = lsh_signs(n_bits, dim)
    ref = ray.put(signs)

    def assign(batch: pa.Table) -> pa.Table:
        s = ray.get(ref)
        emb = np.stack(
            batch[emb_col].to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        bands = _band_values(emb, s, n_bands)  # (n, n_bands)
        parts = []
        for b in range(n_bands):
            t = batch.select([id_col, emb_col])
            t = t.append_column(
                "band", pa.array(np.full(len(t), b, dtype=np.int64))
            )
            t = t.append_column(
                "bval", pa.array(bands[:, b].astype(np.int64))
            )
            parts.append(t)
        return pa.concat_tables(parts)

    fs, root = resolve(path, filesystem)
    fs.makedirs(root, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        root, partition_cols=["band", "bval"], filesystem=ray_fs(fs)
    )
    with fs.open(join(root, _META), "w") as f:
        json.dump(
            {
                "n_bits": n_bits,
                "n_bands": n_bands,
                "dim": dim,
                "emb_col": emb_col,
                "id_col": id_col,
            },
            f,
        )


def lsh_store_topk(
    path: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 5,
    exclude_self: bool = True,
    filesystem=None,
) -> pa.Table:
    """Search the store reading ONLY the queries' (band, band-code)
    partitions; per-batch partial top-k, duplicate candidates (shared >1
    band) deduped at the driver merge."""
    fs, root = resolve(path, filesystem)
    with fs.open(join(root, _META), "r") as f:
        meta = json.load(f)
    n_bits, n_bands = meta["n_bits"], meta["n_bands"]
    emb_col, id_col = meta["emb_col"], meta["id_col"]

    q = np.asarray(queries, dtype=np.float64)
    signs = lsh_signs(n_bits, q.shape[1])
    q_bands = _band_values(q, signs, n_bands)  # (n_q, n_bands)
    qn = _normalize(q)

    # which (band, bval) partitions each query probes; ONE pruned read
    needed = sorted(
        {(b, int(q_bands[qi, b])) for qi in range(len(q)) for b in range(n_bands)}
    )
    files = []
    for b, v in needed:
        d = join(root, f"band={b}", f"bval={v}")
        if not isdir(fs, d):  # empty hash slot: no corpus vector here
            continue
        files.extend(
            join(d, f) for f in listdir(fs, d) if f.endswith(".parquet")
        )
    if not files:
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    # ONE Dataset over every probed file — not one dataset per partition
    # (per-partition datasets cost O(probed partitions) driver overhead,
    # the scale killer for wide probe sets).  The row's partition identity
    # comes back through ``include_paths`` (ground truth from the storage
    # layout — NOT re-derived from the embedding, whose hyperplane dot
    # could flip a near-zero sign bit under a different BLAS batch shape
    # than the build's), so batch/partition alignment is irrelevant: a
    # batch may span partitions freely.
    ds = ray.data.read_parquet(
        files,
        columns=[id_col, emb_col],
        include_paths=True,
        filesystem=ray_fs(fs),
    )
    q_ref = ray.put((qn, q_bands))

    def partial(batch: pa.Table) -> pa.Table:
        qm, qb = ray.get(q_ref)
        ids = np.asarray(batch[id_col].to_pylist())
        emb = _normalize(
            np.stack(batch[emb_col].to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        # partition identity from the file path: parse once per DISTINCT
        # path (a batch holds rows from few files), broadcast to rows
        pcodes = pc.dictionary_encode(batch["path"].combine_chunks())
        codes = np.asarray(pcodes.indices.to_numpy(zero_copy_only=False))
        uniq = pcodes.dictionary.to_pylist()
        ub = np.empty(len(uniq), dtype=np.int64)
        uv = np.empty(len(uniq), dtype=np.int64)
        for i, pth in enumerate(uniq):
            parts_ = pth.split("/")
            ub[i] = int(next(x for x in parts_ if x.startswith("band="))[5:])
            uv[i] = int(next(x for x in parts_ if x.startswith("bval="))[5:])
        bands = ub[codes]
        bvals = uv[codes]
        out_q, out_n, out_s = [], [], []
        kk = min(k + (1 if exclude_self else 0), len(ids))
        for qi in range(len(qm)):
            # rows of this batch living in a partition this query probes
            mask = qb[qi, bands] == bvals
            idx_all = np.flatnonzero(mask)
            if not len(idx_all):
                continue
            row = qm[qi] @ emb[idx_all].T
            sub_ids = ids[idx_all]
            # the store holds one copy per band; same-id duplicates carry
            # identical cosines — keep one occurrence before the kk cut
            sub_ids, first_idx = np.unique(sub_ids, return_index=True)
            row = row[first_idx]
            if kk < len(row):
                seed = np.argpartition(-row, kk - 1)[:kk]
                sel = np.flatnonzero(row >= row[seed].min())
            else:
                sel = np.arange(len(row))
            order = sel[np.lexsort((sub_ids[sel], -row[sel]))][:kk]
            out_q.extend([qi] * len(order))
            out_n.extend(int(i) for i in sub_ids[order])
            out_s.extend(float(s) for s in row[order])
        return pa.table(
            {
                "qi": pa.array(out_q, type=pa.int32()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "cosine": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow").take_all()
    # dedupe multi-band candidates, then rank exactly like _merge_topk
    best: dict[int, dict[int, float]] = {}
    for r in partials:
        best.setdefault(r["qi"], {})[r["neighbor_id"]] = r["cosine"]
    out = {"query_id": [], "neighbor_id": [], "rank": [], "cosine": []}
    for qi, qid in enumerate(query_ids):
        cand = sorted(
            ((-c, n) for n, c in best.get(qi, {}).items())
        )
        rank = 0
        for negc, nid in cand:
            if exclude_self and nid == qid:
                continue
            rank += 1
            if rank > k:
                break
            out["query_id"].append(qid)
            out["neighbor_id"].append(nid)
            out["rank"].append(rank)
            out["cosine"].append(-negc)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"], type=pa.int64()),
            "neighbor_id": pa.array(out["neighbor_id"], type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
            "cosine": pa.array(out["cosine"], type=pa.float64()),
        }
    )
