"""Host-regime probe: aggregate memcpy bandwidth at 1/8/32 concurrent
streams.  This sandbox VM oscillates between hypervisor regimes on a
scale of minutes (BASELINE.md, rounds 2-5: single-stream memcpy 0.9-62
GB/s); every scaling/bench ledger entry should record the probe taken
immediately before it so a degraded sample is attributable.

Usage: python scripts/probe_host.py [mb_per_stream]
Prints one JSON line: {"streams": {1: GBps, 8: GBps, 32: GBps}, ...}
A calm window on this host shows >=5 GB/s single-stream and aggregate
bandwidth that grows (not collapses) from 8 to 32 streams.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _stream(mb: int, n_reps: int, q, barrier) -> None:
    import numpy as np

    a = np.ones(mb * 1024 * 1024 // 8, dtype=np.int64)
    b = np.empty_like(a)
    np.copyto(b, a)  # warm / fault pages
    barrier.wait()  # all streams copy simultaneously
    t0 = time.monotonic()
    for _ in range(n_reps):
        np.copyto(b, a)
    dt = time.monotonic() - t0
    q.put(a.nbytes * n_reps / dt / 1e9)


def probe(mb: int = 128, n_reps: int = 8) -> dict:
    out = {}
    for n_procs in (1, 8, 32):
        q = mp.Queue()
        barrier = mp.Barrier(n_procs)
        procs = [
            mp.Process(target=_stream, args=(mb, n_reps, q, barrier))
            for _ in range(n_procs)
        ]
        for p in procs:
            p.start()
        rates = [q.get() for _ in procs]
        for p in procs:
            p.join()
        # all streams start together (barrier), so summed rates ~ aggregate
        out[str(n_procs)] = {
            "aggregate_gbps": round(sum(rates), 2),
            "per_stream_med_gbps": round(sorted(rates)[len(rates) // 2], 2),
        }
    return out


if __name__ == "__main__":
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    res = probe(mb)
    verdict = "calm" if (
        res["1"]["per_stream_med_gbps"] >= 5.0
        and res["32"]["aggregate_gbps"] >= res["8"]["aggregate_gbps"] * 0.8
    ) else "degraded"
    print(json.dumps({"metric": "host_memcpy_probe", "streams": res,
                      "verdict": verdict, "ts": time.time()}))
