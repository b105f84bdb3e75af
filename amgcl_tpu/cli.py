"""Command-line solver.

The mirror of the reference CLI (examples/solver.cpp:62-120): read a
matrix (MatrixMarket or binary), optionally reorder / scale / reinterpret
as block-valued, select every component at runtime with the same dotted
``key=value`` parameters (precond.coarsening.type=..., solver.type=...),
solve, and print the hierarchy + iterations/error.

    python -m amgcl_tpu.cli -A A.mtx -f b.mtx solver.type=bicgstab \\
        precond.relax.type=ilu0 solver.tol=1e-8 -b 3 --reorder

Also provides the mm2bin / bin2mm converters (examples/mm2bin.cpp,
bin2mm.cpp):

    python -m amgcl_tpu.cli convert A.mtx A.bin
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _load(path):
    from .utils.io import mm_read, bin_read

    if path.endswith(".bin"):
        return bin_read(path)
    return mm_read(path)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)

    # Honour JAX_PLATFORMS from the environment *in the jax config* too:
    # out-of-tree backend plugins can hook get_backend and ignore the
    # env var alone (observed with the axon TPU plugin), leaving a CLI
    # that was asked for CPU hanging on a remote backend init.
    import os as _os

    if _os.environ.get("JAX_PLATFORMS"):
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])

    if argv and argv[0] == "convert":
        from .utils.io import mm_read, mm_write, bin_read, bin_write

        src, dst = argv[1], argv[2]
        M = _load(src)
        if dst.endswith(".bin"):
            bin_write(dst, M)
        else:
            mm_write(dst, M)
        print(f"{src} -> {dst}")
        return 0

    ap = argparse.ArgumentParser(
        prog="amgcl_tpu.cli",
        description="TPU-native AMG solver (capability mirror of the "
        "reference examples/solver.cpp)",
    )
    ap.add_argument("-A", "--matrix", required=True, help="matrix file (.mtx/.bin)")
    ap.add_argument("-f", "--rhs", help="rhs file (default: ones)")
    ap.add_argument("-n", "--null", help="near-nullspace vectors file")
    ap.add_argument("-b", "--block-size", type=int, default=1)
    ap.add_argument("--reorder", action="store_true", help="Cuthill-McKee reorder")
    ap.add_argument("--scale", action="store_true", help="symmetric diagonal scaling")
    ap.add_argument("--grid", help="logical grid dims, e.g. 150,150,150 "
                    "(enables the structured fast path)")
    ap.add_argument("-P", "--params", help="JSON parameter file")
    ap.add_argument("--shards", type=int, default=0,
                    help="solve distributed over N mesh devices (the role "
                    "of the reference's examples/mpi/mpi_solver.cpp; 0 = "
                    "serial)")
    ap.add_argument("--dist-precond", default="coupled_amg",
                    choices=["coupled_amg", "amg", "relaxation", "dummy",
                             "cpr", "schur"],
                    help="distributed preconditioner class")
    ap.add_argument("--pmask", help="pressure-mask file (0/1 per dof) for "
                    "--dist-precond schur")
    ap.add_argument("--dist-setup", action="store_true",
                    help="run the AMG *setup* sharded over the device "
                    "mesh too (distributed PMIS + distributed Galerkin "
                    "products; no participant assembles the global "
                    "matrix — the mpi::amg + mpi/coarsening/pmis role)")
    ap.add_argument("--partition", choices=["slab", "bfs", "bfs-kl"],
                    default="slab",
                    help="distributed row partition: contiguous slabs "
                    "(default), BFS graph-growing reorder, or BFS + "
                    "Kernighan-Lin boundary refinement (the "
                    "parmetis/ptscotch role, mpi/partition/)")
    ap.add_argument("--deflation", action="store_true",
                    help="subdomain deflation (distributed runs)")
    ap.add_argument("-o", "--output", help="write solution (.mtx/.bin)")
    ap.add_argument("prm", nargs="*", help="dotted key=value parameters")
    args = ap.parse_args(argv)

    from .runtime import make_solver_from_config, expand_dotted
    from .utils.profiler import Profiler

    prof = Profiler("amgcl_tpu")

    with prof.scope("read"):
        A = _load(args.matrix)
        rhs = _load(args.rhs) if args.rhs else np.ones(A.shape[0])

    config = {}
    if args.params:
        with open(args.params) as f:
            config = json.load(f)
    flat = {}
    for kv in args.prm:
        k, _, v = kv.partition("=")
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass
        flat[k] = v
    for k, v in expand_dotted(flat).items():
        if isinstance(v, dict) and isinstance(config.get(k), dict):
            _deep_update(config[k], v)
        else:
            config[k] = v
    if args.block_size > 1:
        config["block"] = args.block_size

    reorder = scale = None
    if args.reorder:
        from .adapter import ReorderedProblem

        reorder = ReorderedProblem(A)
        A, rhs = reorder.A, reorder.forward(rhs)
    if args.scale:
        from .adapter import ScaledProblem

        scale = ScaledProblem(A)
        A, rhs = scale.A, scale.scale_rhs(rhs)
    if args.grid:
        dims = tuple(int(d) for d in args.grid.split(","))
        config.setdefault("precond", {})["coarsening"] = {
            "type": "grid_aggregation", "dims": dims,
        }
    if args.null:
        B = np.asarray(_load(args.null))
        if B.ndim == 1:
            B = B[:, None]
        config.setdefault("precond", {}).setdefault("coarsening", {})[
            "nullspace"
        ] = B

    part_inv = part_perm = None
    if args.shards and args.partition != "slab":
        from .parallel.graph_partition import (
            partition_bfs, refine_kl, apply_partition, edge_cut,
        )

        perm = partition_bfs(A, args.shards)
        if args.partition == "bfs-kl":
            perm = refine_kl(A, perm, args.shards)
        cut = edge_cut(A, perm, args.shards)
        print(f"# partition={args.partition} shards={args.shards} "
              f"edge_cut={cut}", file=sys.stderr)
        A, part_inv = apply_partition(A, perm)
        rhs = np.asarray(rhs)[perm]
        part_perm = perm

    if args.shards and args.dist_setup:
        import collections
        import scipy.sparse as _spa

        from .parallel.dist_setup import ShardedGeneralAMG

        from .precond.amg import AMGParams as _AMGParams

        _Info = collections.namedtuple("Info", "iters error")
        sol = dict(config.get("solver", {}))
        pprm_ds = config.get("precond", {})
        amg_kw = {
            k: pprm_ds[k] for k in ("coarse_enough", "max_levels",
                                    "npre", "npost", "ncycle")
            if k in pprm_ds
        }
        with prof.scope("setup (sharded)"):
            H = ShardedGeneralAMG.from_global(
                _spa.csr_matrix(A), args.shards,
                params=_AMGParams(**amg_kw) if amg_kw else None,
                eps_strong=float(
                    pprm_ds.get("coarsening", {}).get("eps_strong", 0.08)
                ),
            )
            run_fn = H.make_solver(
                tol=float(sol.get("tol", 1e-8)),
                maxiter=int(sol.get("maxiter", 200)),
            )

        class _Sharded:
            precond = None

            def __call__(self, b):
                x, iters, res = run_fn(np.asarray(b))
                return x, _Info(iters, res)

        S = _Sharded()
    elif args.shards:
        from .parallel.dist_solver import DistSolver
        from .coarsening import make_coarsening
        from .relaxation import make_smoother
        from .precond.amg import AMGParams

        sol = dict(config.get("solver", {}))
        pprm = dict(config.get("precond", {}))
        pprm.pop("class", None)
        kw = dict(
            solver=sol.pop("type", "cg"),
            n_shards=args.shards,
            precond=args.dist_precond,
            deflation=args.deflation,
            **sol,
        )
        if args.grid:
            kw["dims"] = tuple(int(d) for d in args.grid.split(","))
            pprm.pop("coarsening", None)   # the dims kwarg drives the
            # grid path; the injected grid_aggregation config is serial-only
        elif "coarsening" in pprm:
            cprm = dict(pprm.pop("coarsening"))
            kw["coarsening"] = make_coarsening(
                cprm.pop("type", "smoothed_aggregation"), **cprm
            )
        if "relax" in pprm:
            rprm = dict(pprm.pop("relax"))
            kw["relaxation"] = make_smoother(
                rprm.pop("type", "spai0"), **rprm
            )
        if args.dist_precond == "cpr":
            kw["cpr_block_size"] = int(pprm.pop("block_size", args.block_size))
        if args.dist_precond == "schur":
            if not args.pmask:
                raise ValueError("--dist-precond schur requires --pmask")
            pm = np.asarray(_load(args.pmask)).ravel()
            if reorder is not None:
                pm = np.asarray(reorder.forward(pm))
            if part_perm is not None:
                pm = pm[part_perm]
            kw["pmask"] = pm.astype(bool)
        amg_keys = {k: pprm.pop(k) for k in list(pprm)
                    if k in {"coarse_enough", "direct_coarse", "max_levels",
                             "npre", "npost", "ncycle", "pre_cycles"}}
        if amg_keys:
            kw["amg_params"] = AMGParams(**amg_keys)
        if pprm:
            raise ValueError(
                f"unsupported distributed precond parameter(s): "
                f"{sorted(pprm)}"
            )
        with prof.scope("setup"):
            S = DistSolver(A, **kw)
    else:
        with prof.scope("setup"):
            S = make_solver_from_config(A, config)

    if hasattr(getattr(S, "precond", None), "levels"):
        print(repr(S.precond))
        print()

    with prof.scope("solve (incl. compile)"):
        x, info = S(rhs)
        iters = int(info.iters)
    with prof.scope("solve (compiled)"):
        x, info = S(rhs)
        iters = int(info.iters)

    xs = np.asarray(x, dtype=np.float64)
    if part_inv is not None:
        xs = xs[part_inv]
    if scale is not None:
        xs = scale.unscale_solution(xs)
    if reorder is not None:
        xs = reorder.backward(xs)

    print(f"Iterations: {iters}")
    print(f"Error:      {float(info.error):.6e}")
    print()
    print(prof.report())
    if getattr(S, "shard_profilers", None):
        from .utils.profiler import aggregate_profiles

        # min/avg/max across shards (reference capability:
        # perf_counter/mpi_aggregator.hpp)
        print()
        print(aggregate_profiles(S.shard_profilers))

    if args.output:
        from .utils.io import mm_write, bin_write

        (bin_write if args.output.endswith(".bin") else mm_write)(
            args.output, xs
        )
    return 0


def _deep_update(dst: dict, src: dict):
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v


if __name__ == "__main__":
    sys.exit(main())
