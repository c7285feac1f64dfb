"""Host-parking of the fused-iteration design state (-park_design).

At 512^3 the chunked fused iteration's design/MMA/filter fields do not
fit next to the solve's peak HBM; parking moves them to the host during
the solve phase (parallel/fused_step.py).  Parking is pure data
movement, so the trajectory must be BIT-exact vs the unparked step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from topopt_in_petsc_tpu.config import TopOptConfig
from topopt_in_petsc_tpu.parallel.fused_step import make_fused_step


def _cfg(park, **kw):
    return TopOptConfig(
        nx=17, ny=9, nz=9, nlvls=2, dtype="float32",
        operator_impl="blocked", ksp_chunk=8, park_design=park,
        maxItr=3, **{"rmin": 0.16, **kw},
    )


# rmin 0.16 -> 3^3-tap direct conv; rmin 0.55 -> 9^3 taps -> the FFT
# backend, whose parked route ships only the spectrum and RECOMPUTES
# Hs in-program (opt/filters._Hs_or_recompute)
@pytest.mark.parametrize("rmin", [0.16, 0.55])
def test_park_is_bit_exact(rmin):
    traj = {}
    for park in (0, 1):
        cfg = _cfg(park, rmin=rmin)
        cfg.validate()
        step, state = make_fused_step(cfg)
        vals = []
        for itr in (1, 2, 3):
            state = step(state, itr)
            vals.append((
                np.asarray(state.x).copy(),
                float(state.fx), float(state.ch),
            ))
        traj[park] = vals
    for (x0, fx0, ch0), (x1, fx1, ch1) in zip(traj[0], traj[1]):
        assert fx0 == fx1
        assert ch0 == ch1
        np.testing.assert_array_equal(x0, x1)


def test_tail_split_matches_fused_tail():
    """-tail_split (two-program tail) is the same ops in two programs:
    the 3-iteration trajectory must match the single-program tail to
    f32 roundoff (XLA refusion across the split can reorder reductions,
    so exact bitness is not guaranteed — agreement must be ~1e-6)."""
    traj = {}
    for split in (False, True):
        cfg = _cfg(0, tail_split=split)
        cfg.validate()
        step, state = make_fused_step(cfg)
        vals = []
        for itr in (1, 2, 3):
            state = step(state, itr)
            vals.append((float(state.fx), float(state.ch)))
        traj[split] = vals
    for (fx0, ch0), (fx1, ch1) in zip(traj[False], traj[True]):
        assert fx0 == pytest.approx(fx1, rel=1e-6)
        assert ch0 == pytest.approx(ch1, rel=1e-5)


def test_parked_driver_restart_roundtrip(tmp_path):
    """FusedDriver checkpoint/restart with parking on vs off: the
    parked leaves cross the restart boundary as host arrays; the
    interrupted-and-resumed trajectory must be IDENTICAL to the same
    interruption without parking (parking is pure data movement —
    restart reconstruction semantics are shared and cancel out)."""
    from topopt_in_petsc_tpu.fused_driver import FusedDriver

    def cfg_for(workdir, maxItr, park, **kw):
        c = TopOptConfig(
            nx=17, ny=9, nz=9, nlvls=2, rmin=0.16, dtype="float32",
            operator_impl="blocked", ksp_chunk=8, park_design=park,
            fused=True, maxItr=maxItr, workdir=str(workdir), **kw,
        )
        c.validate()
        return c

    final_fx = {}
    for park in (0, 1):
        wd = tmp_path / f"p{park}"
        d1 = FusedDriver(cfg_for(wd, 2, park))
        d1.run()
        latest = d1.restart_mgr.latest()
        assert latest is not None
        d2 = FusedDriver(cfg_for(wd, 4, park, restartFileVec=latest))
        resumed = d2.run()
        final_fx[park] = resumed["fx"][-1]
    assert final_fx[0] == final_fx[1]


def test_parked_leaves_live_on_host():
    cfg = _cfg(1)
    cfg.validate()
    step, state = make_fused_step(cfg)
    # the init state's parked leaves are host (numpy) arrays
    for f in ("x", "xTilde", "L", "U", "xo1", "xo2"):
        assert isinstance(getattr(state, f), np.ndarray), f
    # device-resident leaves stay device arrays
    assert not isinstance(state.xPhys, np.ndarray)
    s = step(state, 1)
    for f in ("x", "xTilde", "L", "U", "xo1", "xo2"):
        assert isinstance(getattr(s, f), np.ndarray), f
    assert not isinstance(s.xPhys, np.ndarray)
    assert jnp.isfinite(jnp.asarray(s.fx))
