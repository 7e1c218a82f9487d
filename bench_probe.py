"""Host-health probes for the scaling-rep protocol (BASELINE.md round 3).

The north-rule scaling pairs (bench_scaling.py at 2 vs 8 cores) are only
quotable when the host is quiet: this box shows recurring CPU-steal and
memory-bandwidth faults (BASELINE.md "Protocol upgrade: dual bracketing
probes"). Every rep leg is therefore bracketed by TWO independent probes:

- **sha control** (CPU): P processes each hash a small buffer in a tight
  loop for ~3 s; reports aggregate mega-hashes/s. Sees CPU steal, blind to
  memory-bandwidth faults.
- **bw probe** (memory): P processes each np.copyto() a 256 MiB src→dst
  pair (512 MiB resident per process) for ~3 s; reports aggregate GB/s
  copied. Sees the bandwidth fault the sha control cannot.

Validity rule (pre-registered, BASELINE.md): a rep counts only if its
three bracketing probes (pre / between-legs / post) agree within 25% on
sha_8p AND bw_8p. The rule is internal to a rep — absolute bands are
recorded per session, so probe-code changes can't fake validity.

This file replaces the /tmp scripts lost to a host reboot (2026-08-19);
same methodology, now durable in-repo. Usage:

    python bench_probe.py            # one probe line: {sha_2p, sha_8p, bw_2p, bw_8p}
    python bench_probe.py sha 8      # single measurement
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

import numpy as np

PROBE_SECONDS = 3.0
BW_MBYTES = 256  # per-process src size; pair = 2x this resident


def _sha_worker(barrier, seconds: float, out) -> None:
    buf = b"\x5a" * 64
    h = hashlib.sha256
    barrier.wait()
    t0 = time.time()
    stop_t = t0 + seconds
    n = 0
    while time.time() < stop_t:
        for _ in range(10_000):
            h(buf).digest()
        n += 10_000
    out.put(n / (time.time() - t0))


def _bw_worker(barrier, seconds: float, out) -> None:
    # Allocate + first-touch BEFORE the barrier: forked children on this
    # sandbox page-fault fresh anon memory 10x slower than the parent
    # (~0.1-0.3 GB/s), which must not contaminate the timed copy window.
    src = np.ones(BW_MBYTES * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault dst pages in
    barrier.wait()
    t0 = time.time()
    stop_t = t0 + seconds
    n = 0
    while time.time() < stop_t:
        np.copyto(dst, src)
        n += 1
    out.put(n * src.nbytes / (time.time() - t0))


def probe(kind: str, procs: int, seconds: float = PROBE_SECONDS) -> float:
    """Run `procs` workers for `seconds` (timed section starts at a barrier
    AFTER per-worker setup); return aggregate Mh/s (sha) or GB/s (bw)."""
    worker = _sha_worker if kind == "sha" else _bw_worker
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(procs)
    ps = [mp.Process(target=worker, args=(barrier, seconds, q)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    if kind == "sha":
        return round(total / 1e6, 2)  # Mh/s
    return round(total / 1e9, 1)  # GB/s


def full_probe() -> dict:
    return {
        "ts": round(time.time(), 1),
        "sha_2p": probe("sha", 2),
        "sha_8p": probe("sha", 8),
        "bw_2p": probe("bw", 2),
        "bw_8p": probe("bw", 8),
    }


if __name__ == "__main__":
    if len(sys.argv) >= 3:
        print(probe(sys.argv[1], int(sys.argv[2])))
    else:
        print(json.dumps(full_probe()))
