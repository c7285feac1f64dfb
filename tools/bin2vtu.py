#!/usr/bin/env python3
"""Offline .dat -> .vtu converter (the reference's bin2vtu_v3.py workflow).

Usage:  python tools/bin2vtu.py [dataset_index] [path/to/output_00000.dat]
"""

import sys

sys.path.insert(0, ".")

from topopt_in_petsc_tpu.io.mpiio_dat import dat_to_vtu  # noqa: E402


def main():
    itr = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    path = sys.argv[2] if len(sys.argv) > 2 else "output_00000.dat"
    out = dat_to_vtu(path, "output", itr)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
