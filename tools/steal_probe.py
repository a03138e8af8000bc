"""Host-contention probe: 32-process busy-spin for ~3s, reporting hypervisor
steal (from /proc/stat deltas) and per-core iteration max/min dispersion.

Read rule (BENCH_NOTES.md): bracket every bench window with this probe.
steal <~2% and max/min <~1.4 = clean window; above that, per-row swings on
untouched code are noise and only interleaved A/Bs are readable.
"""

from __future__ import annotations

import multiprocessing as mp
import time


def _spin(dur: float, out) -> None:
    end = time.time() + dur
    n = 0
    while time.time() < end:
        for _ in range(10_000):
            n += 1
    out.put(n)


def _stat() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal ...
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main(nproc: int = 32, dur: float = 3.0) -> None:
    t0, s0 = _stat()
    q = mp.Queue()
    ps = [mp.Process(target=_spin, args=(dur, q)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    t1, s1 = _stat()
    iters = sorted(q.get() for _ in ps)
    dt, ds = t1 - t0, s1 - s0
    print(
        f"steal={100.0 * ds / max(dt, 1):.1f}% of cpu time; "
        f"per-core iters max/min={iters[-1] / max(iters[0], 1):.2f}"
    )


if __name__ == "__main__":
    main()
