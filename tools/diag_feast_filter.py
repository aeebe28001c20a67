"""Diagnose the production-FEAST contour filter quality on the CH3CN tree.

For one quadrature node z in the nu8 window, run the TTNS contour solve
with (a) a random complex maxD=3 guess, (b) a "bright state" basis guess
(the |0..1_bend..0> HO product state), and report:
  - the true relative residual ||(zI-H)x - b|| / ||b|| (computed via TTNO
    apply + linear combination at a generous fit bond),
  - the Rayleigh quotient of the filtered vector (should fall toward the
    window if the filter acts).
Run: python tools/diag_feast_filter.py [N=8]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from eigensolvers_tpu.models.molecules import ch3cn_tree_operator
    from eigensolvers_tpu.utils.units import au2unit, unit2au
    from eigensolvers_tpu.vectors.ttns import TTNSVector

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    maxD = 3
    EPS = 5e-9
    op, topo, parts, _ = ch3cn_tree_operator(N=N)
    dims = [int(N ** len(p)) for p in parts]
    opts = {"compressArgs": {"maxD": maxD, "eps": EPS},
            "stateFittingArgs": {"maxD": 20, "eps": EPS},
            "linearSystemArgs": {"method": "als", "nSweep": 30,
                                 "convTol": 1e-4, "siteTol": 1e-5,
                                 "linearIter": 150, "linear_tol": 1e-4,
                                 "maxD": maxD, "eps": EPS}}

    # zpve for N=8 tree from the committed ledger (9837.x); recompute is
    # expensive, use the known band instead
    zpve_cm = 9837.45
    z = complex(unit2au(zpve_cm + 361.0, "cm-1"), unit2au(3.0, "cm-1"))

    def product_state(excite_node=None, excite_idx=0):
        # product basis state: all bonds 1; node tensor (1, dims[i], 1..1)
        ts = []
        for i in range(len(topo)):
            shape = (1, int(dims[i])) + (1,) * len(topo.children[i])
            t = np.zeros(shape, np.complex128)
            phys = excite_idx if i == excite_node else 0
            t[(0, phys) + (0,) * len(topo.children[i])] = 1.0
            ts.append(t)
        return ts

    # the nu8 bend pair lives on the fused [x11 x12] leaf
    bend = next(i for i, p in enumerate(parts) if p == [10, 11])
    guesses = {
        "random": TTNSVector.random(topo, dims, maxD=maxD, options=opts,
                                    seed=20, dtype=np.complex128),
        "bright x11=1": TTNSVector(product_state(bend, 1 * N), opts,
                                   topo=topo).normalize(),
        "bright x12=1": TTNSVector(product_state(bend, 1), opts,
                                   topo=topo).normalize(),
    }

    import copy as _copy
    wide = _copy.deepcopy(opts)
    wide["compressArgs"] = {"maxD": 40, "eps": 1e-12}

    for name, y in guesses.items():
        y = y.normalize()
        rq0 = float(np.real(TTNSVector.matrixRepresentation(op, [y])[0, 0]))
        print(f"[{name}] guess RQ: {au2unit(rq0, 'cm-1'):.1f} cm-1 "
              f"(window center {zpve_cm + 361.0:.1f})", flush=True)
        t0 = time.time()
        x = TTNSVector.solve(op, y, z, opType="gen")
        dt = time.time() - t0
        # true residual at a generous bond: r = (zI-H)x - y
        xw = TTNSVector(x.tensors, wide, topo=topo)
        yw = TTNSVector(y.tensors, wide, topo=topo)
        hx = xw.applyOp(op)
        r = TTNSVector.linearCombination([xw * z, hx, yw],
                                         [1.0, -1.0, -1.0])
        rel = float(r.norm() / y.norm())
        nx = float(x.norm())
        rqx = float(np.real(TTNSVector.matrixRepresentation(op, [x])[0, 0])
                    / nx ** 2)
        print(f"[{name}] solve {dt:.0f}s  rel res {rel:.3e}  "
              f"filtered RQ {au2unit(rqx, 'cm-1'):.1f} cm-1  "
              f"|x| {nx:.3e}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
