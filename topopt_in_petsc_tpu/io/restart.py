"""Checkpoint / restart with A/B file flip.

Mirrors the reference restart machinery (TopOpt.cc:386-570 +
LinearElasticity.cc:447-478, 551-611):

- two alternating checkpoint streams (Restart00 / Restart01) so one intact
  checkpoint survives a crash mid-write (the `flip` bool,
  TopOpt.cc:526-531),
- the optimization state set: x, xPhys, MMA history xo1/xo2, asymptotes
  U/L, iteration counter and objective scale fscale (TopOpt.cc:552-562),
- the FE state U in its own file pair (RestartSol00/01) used to warm-start
  the Krylov solver on resume (LinearElasticity.cc:472, 607).

Unlike the reference's PetscViewer binary dumps — which assume the same
mesh *and rank count* on reload (TopOpt.cc:475-477) — checkpoints here are
layout-independent single .npz files of global arrays (SURVEY hard-part
#6): any device-mesh shape can resume them.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _checksum(arr: np.ndarray) -> int:
    """Content checksum for checkpoint integrity (the reference relies on
    the A/B flip alone, TopOpt.cc:526-531; we verify on load too)."""
    from topopt_in_petsc_tpu.io import native

    return native.checksum64(np.ascontiguousarray(arr).tobytes())


class RestartManager:
    def __init__(self, workdir: str = "./", enabled: bool = True):
        self.enabled = enabled
        self.flip = True
        self.workdir = workdir
        self.file00 = os.path.join(workdir, "Restart00.npz")
        self.file01 = os.path.join(workdir, "Restart01.npz")
        self.sol00 = os.path.join(workdir, "RestartSol00.npz")
        self.sol01 = os.path.join(workdir, "RestartSol01.npz")

    # -- write (TopOpt::WriteRestartFiles + physics counterpart) ------- #

    def write(self, itr: int, fscale: float, x, xPhys, xo1, xo2, U, L,
              state_u) -> None:
        if not self.enabled:
            return
        self.flip = not self.flip
        path = self.file00 if not self.flip else self.file01
        sol_path = self.sol00 if not self.flip else self.sol01
        tmp = path + ".tmp.npz"
        x_np = np.asarray(x)
        np.savez(
            tmp,
            itr=np.int64(itr),
            fscale=np.float64(fscale),
            x=x_np,
            xPhys=np.asarray(xPhys),
            xo1=np.asarray(xo1),
            xo2=np.asarray(xo2),
            U=np.asarray(U),
            L=np.asarray(L),
            checksum=np.uint64(_checksum(x_np)),
        )
        os.replace(tmp, path)
        tmp = sol_path + ".tmp.npz"
        np.savez(tmp, u=np.asarray(state_u))
        os.replace(tmp, sol_path)

    # -- read (AllocateMMAwithRestart, TopOpt.cc:463-506) -------------- #

    def load(self, path: str) -> Optional[dict]:
        """Load a checkpoint; returns None (with a message) if missing."""
        if not path or not os.path.exists(path):
            if path:
                print(f"File: {path} NOT FOUND")
            return None
        with np.load(path) as z:
            data = {k: z[k] for k in z.files}
        if "checksum" in data:
            got = _checksum(np.asarray(data["x"]))
            if int(data["checksum"]) != got:
                print(f"CHECKPOINT CORRUPT (checksum mismatch): {path}")
                return None
        return data

    def load_state(self, path: str) -> Optional[np.ndarray]:
        if not path or not os.path.exists(path):
            if path:
                print(f"File: {path} NOT FOUND")
            return None
        with np.load(path) as z:
            return z["u"]

    def latest(self) -> Optional[str]:
        """Most recent intact checkpoint of the A/B pair."""
        cands = [p for p in (self.file00, self.file01) if os.path.exists(p)]
        if not cands:
            return None
        return max(cands, key=os.path.getmtime)
