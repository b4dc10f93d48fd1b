"""North-rule gate, rerunnable: keep/drop F1 vs reference-semantics
labels and byte-identical scrubbed text per url, at 20k pages (seed 123,
the config BENCH.md's numbers cite), for BOTH battery routes (default
Arrow-UDF and the ASCII fast path).  Prints one JSON line.

    python tools/f1_gate.py            # ~1 min at local[32]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("F1_PAGES", "20000"))
SEED = int(os.environ.get("F1_SEED", "123"))


def main() -> int:
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.pipeline.quality_filter import quality_filter
    from harvesttext_spark.session import get_spark
    from tests.reference_impl import label_py

    spark = get_spark(app_name="f1_gate")
    pages = synthesize_pages(spark, n=N_PAGES, seed=SEED, partitions=64)
    raw = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}

    out = {}
    t_all = time.time()
    for route, kw in (("default", {}), ("fast_path", {"fast_path": True})):
        t0 = time.time()
        got = {
            r["url"]: (r["text_clean"], bool(r["keep"]))
            for r in quality_filter(pages, **kw)
            .select("url", "text_clean", "keep")
            .collect()
        }
        wall = time.time() - t0
        tp = fp = fn = tn = byte_mismatch = 0
        for url, text in raw.items():
            want_clean, want_keep, _ = label_py(text)
            clean, keep = got[url]
            if clean != want_clean:
                byte_mismatch += 1
            if keep and want_keep:
                tp += 1
            elif keep and not want_keep:
                fp += 1
            elif not keep and want_keep:
                fn += 1
            else:
                tn += 1
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        out[route] = {
            "f1": round(f1, 6),
            "tp": tp, "fp": fp, "fn": fn, "tn": tn,
            "byte_mismatches": byte_mismatch,
            "wall_sec": round(wall, 2),
        }
        print(f"# {route}: f1={f1:.6f} bytes={byte_mismatch}/{N_PAGES} "
              f"({wall:.1f}s)", file=sys.stderr, flush=True)
    spark.stop()
    payload = {"metric": "keep_drop_f1_20k", "n_pages": N_PAGES, "seed": SEED,
               "routes": out, "total_sec": round(time.time() - t_all, 1)}
    print(json.dumps(payload))
    ok = all(
        r["f1"] >= 0.99 and r["byte_mismatches"] == 0 for r in out.values()
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
