#!/usr/bin/env python
"""Ingest load generator — the khronus-stress analogue.

The reference ships a CLI that posts configurable concurrent batches of
random timer values at the ingest endpoint
(`khronus-stress/src/main/scala/com/searchlight/khronus/stress/
StressTest.scala:41-111`). This is the same tool against the Spark
engine's HTTP shim (`khronus_spark/service.py`): N worker threads ×
R requests × M measurements of V values each, deterministic RNG per
worker, fire-and-forget 200s, one JSON summary line at the end.

Ingest is at-most-once fire-and-forget like the reference (the 200 acks
receipt, not landing), so read-your-write mid-load is out of contract;
after the post storm the tool settles (`wait_idle` in-process, `--settle`
seconds against a remote) and runs one dashboard query per stressed
metric to verify the read path end-to-end under the freshly-ingested
data.

Usage (spins up an in-process service against a temp landing dir when
--url is not given):

    python scripts/stress.py --workers 8 --requests 50 \
        --measurements 20 --values 10 [--gzip] [--verify]
    python scripts/stress.py --url http://host:port --settle 5 [...]
"""

from __future__ import annotations

import argparse
import gzip as gzip_mod
import json
import random
import sys
import tempfile
import threading
import time
import urllib.parse
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def make_batch(rng: random.Random, n_measurements: int, n_values: int) -> dict:
    """Random timer batch, reference-shaped (values 0..2000 ms)."""
    now = int(time.time() * 1000)
    return {
        "metrics": [
            {
                "name": f"stress.timer-{rng.randrange(8)}",
                "mtype": "timer",
                "measurements": [
                    {
                        "ts": now - rng.randrange(30_000),
                        "values": [rng.randrange(2000) for _ in range(n_values)],
                    }
                    for _ in range(n_measurements)
                ],
            }
        ]
    }


def worker(
    wid: int,
    base: str,
    n_requests: int,
    n_measurements: int,
    n_values: int,
    use_gzip: bool,
    out: dict,
):
    rng = random.Random(1000 + wid)  # deterministic per worker
    ok = err = 0
    posted: set[str] = set()
    t0 = time.perf_counter()
    for i in range(n_requests):
        batch = make_batch(rng, n_measurements, n_values)
        posted.update(m["name"] for m in batch["metrics"])
        body = json.dumps(batch).encode()
        headers = {"Content-Type": "application/json"}
        if use_gzip:
            body = gzip_mod.compress(body)
            headers["Content-Encoding"] = "gzip"
        req = urllib.request.Request(
            f"{base}/khronus/metrics", data=body, method="POST", headers=headers
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                ok += resp.status == 200
        except Exception:
            err += 1
    out[wid] = {
        "ok": ok,
        "err": err,
        "posted": posted,
        "sec": round(time.perf_counter() - t0, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default=None, help="service base URL; default: in-process")
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--requests", type=int, default=25)
    ap.add_argument("--measurements", type=int, default=10)
    ap.add_argument("--values", type=int, default=10)
    ap.add_argument("--gzip", action="store_true")
    ap.add_argument("--verify", action="store_true",
                    help="after settling, query each stressed metric")
    ap.add_argument("--settle", type=float, default=0.0,
                    help="seconds to wait before --verify against --url")
    args = ap.parse_args()

    svc = None
    base = args.url
    if base is None:
        from pyspark.sql import SparkSession

        from khronus_spark.service import KhronusHttpService

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("khronus-stress")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        landing = tempfile.mkdtemp(prefix="khronus_stress_") + "/in"
        # engine_factory=None → the service's own _default_engine, the
        # single source of truth for the measurements schema
        svc = KhronusHttpService(spark, landing)
        svc.start()
        base = f"http://127.0.0.1:{svc.port}"

    results: dict = {}
    threads = [
        threading.Thread(
            target=worker,
            args=(
                w,
                base,
                args.requests,
                args.measurements,
                args.values,
                args.gzip,
                results,
            ),
        )
        for w in range(args.workers)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    total_ok = sum(r["ok"] for r in results.values())
    total_err = sum(r["err"] for r in results.values())
    values_posted = total_ok * args.measurements * args.values

    total_q = total_qerr = 0
    if args.verify:
        if svc is not None:
            svc.wait_idle(timeout=300.0)
        elif args.settle:
            time.sleep(args.settle)
        posted = sorted(set().union(*(r["posted"] for r in results.values())))
        for name in posted:
            q = (
                f'select count from "{name}" '
                "where time > now() - 1h group by time(1m)"
            )
            url = f"{base}/khronus/db/influx/series?q=" + urllib.parse.quote(q)
            try:
                with urllib.request.urlopen(url, timeout=120) as resp:
                    resp.read()
                total_q += 1
            except Exception:
                total_qerr += 1
    print(
        json.dumps(
            {
                "metric": "khronus_spark ingest stress",
                "requests_ok": total_ok,
                "requests_err": total_err,
                "queries_ok": total_q,
                "queries_err": total_qerr,
                "values_posted": values_posted,
                "wall_sec": round(wall, 3),
                "values_per_sec": int(values_posted / wall) if wall else 0,
            }
        )
    )
    if svc is not None:
        svc.wait_idle()
        svc.stop()


if __name__ == "__main__":
    main()
