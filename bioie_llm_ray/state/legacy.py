"""Legacy K2 result-file writer — byte-compatible with the reference's format.

Mirrors /root/reference/src/evaluators/evaluator.py:78-131 so that the
stage-chaining reader (``sources.readers.read_legacy_result_file``) and any
downstream consumer of the reference's result files can interoperate.  Our
canonical sink is partitioned Parquet (state.checkpoint); this exists for
format parity only, and is written on the driver (reports are small).
"""

from __future__ import annotations

from collections.abc import Sequence

_LINE = "-" * 68
_DLINE = "=" * 68
_SLINE = "*" * 68
_HLINE = "#" * 68


def write_result_file(
    path: str,
    src: Sequence[str] | None,
    pred: Sequence[str],
    true: Sequence[str],
    scores: dict[str, float] | None = None,
    n_shots: int = 0,
    task_prompt: str = "",
    exec_time: str = "",
    orig: Sequence[tuple[str, str, str]] = (),
) -> None:
    scores = scores or {}

    def s(key: str) -> float:
        return scores.get(key, 0.0)

    with open(path, "w") as f:
        f.write(f">> N-shots: {n_shots}\n")
        f.write(f">> Execution time: {exec_time}\n")
        f.write(f">> Task prompt:\n{task_prompt}\n")
        f.write(_LINE + "\n")
        f.write(f">>             Accuracy: {s('accuracy'):.4f}\n")
        f.write(
            f">> (macro)    Precision: {s('macro_p'):.4f}, "
            f"Recall: {s('macro_r'):.4f}, F1: {s('macro_f'):.4f}\n"
        )
        f.write(
            f">> (micro)    Precision: {s('micro_p'):.4f}, "
            f"Recall: {s('micro_r'):.4f}, F1: {s('micro_f'):.4f}\n"
        )
        f.write(
            f">> (weighted) Precision: {s('weighted_p'):.4f}, "
            f"Recall: {s('weighted_r'):.4f}, F1: {s('weighted_f'):.4f}\n"
        )
        f.write(_DLINE + "\n")
        if src is not None:
            f.write("Num, Src, Pred, True:\n")
            f.write(_SLINE + "\n")
            for i, (a, p, t) in enumerate(zip(src, pred, true), 1):
                if isinstance(a, (list, tuple)):
                    a = "(" + ", ".join(sorted(a)) + ")"
                f.write(f"{i}, {a}, {p}, {t}\n")
        else:
            f.write("Num, Pred, True:\n")
            f.write(_SLINE + "\n")
            for i, (p, t) in enumerate(zip(pred, true), 1):
                f.write(f"{i}, {p}, {t}\n")
        if orig:
            f.write(_HLINE + "\n")
            f.write("<< Original texts >>\n")
            for i, (a, p, t) in enumerate(orig, 1):
                f.write(f">> No: {i}\n>> Entity: {a}\n>> Pred: {p}\n>> True: {t}\n")


def write_raw_results_json(results: "ray.data.Dataset | list | dict", path: str) -> str:
    """K4: raw JSON dump of a task's results (run_model.py:752-762).

    The reference json.dumps the ``entity_and_entity_type`` task's
    preprocessed results into one ``*_result_<ts>.txt`` file.  Accepts a
    (small, task-scale) predictions Dataset, a row list, or any
    JSON-serializable object; Dataset rows are materialized on the driver —
    task outputs are bounded by test_sample_size, not corpus size.
    """
    import json

    try:
        import ray

        if isinstance(results, ray.data.Dataset):
            results = results.take_all()
    except ImportError:  # pragma: no cover
        pass
    with open(path, "w") as f:
        json.dump(results, f)
    return path
