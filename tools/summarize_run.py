"""Summarize a driver log: per-iteration stats for docs/BASELINE artifacts.

Usage: python tools/summarize_run.py <logfile>

Parses the reference-format lines
  `State solver:  iter: N, rerr.: E, time: T`
  `It.: n, True fx: F, Scaled fx: S, gx[0]: G, ch.: C, mnd.: M, time: T`
and prints a compact summary (iterations, s/iter percentiles, solver
iteration distribution, first/last compliance, final change).
"""

import re
import sys


def main(path: str) -> None:
    solver = []  # (iters, relres, time)
    opt = []  # (itr, fx, scaled, gx0, ch, mnd, time)
    s_re = re.compile(
        r"State solver:\s+iter: (\d+), rerr\.: ([\d.eE+-]+), "
        r"time: ([\d.]+)"
    )
    i_re = re.compile(
        r"It\.: (\d+), True fx: ([\d.eE+-]+), Scaled fx: ([\d.eE+-]+), "
        r"gx\[0\]: ([\d.eE+-]+), ch\.: ([\d.eE+-]+), mnd\.: ([\d.eE+-]+), "
        r"time: ([\d.]+)"
    )
    with open(path) as f:
        for line in f:
            m = s_re.search(line)
            if m:
                solver.append(
                    (int(m[1]), float(m[2]), float(m[3]))
                )
            m = i_re.search(line)
            if m:
                opt.append(tuple(float(m[g]) for g in range(1, 8)))

    if not opt:
        print("no iteration lines found")
        return

    times = sorted(o[6] for o in opt)
    its = sorted(s[0] for s in solver)

    def pct(v, p):
        return v[min(len(v) - 1, int(p / 100 * len(v)))]

    n = len(opt)
    # steady state: skip the first two iterations (compiles, fscale)
    steady = sorted(o[6] for o in opt[2:]) or times
    print(f"iterations: {n}")
    print(
        f"s/iteration (steady): median {pct(steady, 50):.2f}, "
        f"p10 {pct(steady, 10):.2f}, p90 {pct(steady, 90):.2f}, "
        f"total {sum(o[6] for o in opt):.0f} s"
    )
    print(
        f"solver iterations: median {pct(its, 50)}, "
        f"min {its[0]}, max {its[-1]}, stalls "
        f"{sum(1 for s in solver if s[0] >= 200)}"
    )
    print(
        f"fx: first {opt[0][1]:.4f} -> last {opt[-1][1]:.4f}; "
        f"final ch {opt[-1][4]:.5f}, final mnd {opt[-1][5]:.4f}, "
        f"final gx[0] {opt[-1][3]:+.5f}"
    )


if __name__ == "__main__":
    main(sys.argv[1])
