"""Hierarchy report — the analogue of operator<<(ostream, amg)
(reference: amgcl/amg.hpp:560-598): per-level unknowns/nonzeros/memory and
the grid/operator complexities."""

from __future__ import annotations


def _human_bytes(b: float) -> str:
    for unit in ("B", "K", "M", "G", "T"):
        if abs(b) < 1024.0:
            return f"{b:6.2f} {unit}"
        b /= 1024.0
    return f"{b:6.2f} P"


def hierarchy_report(amg) -> str:
    levels = amg.levels
    rows0 = levels[0].A.shape[0]
    nnz0 = levels[0].A.nnz
    sum_rows = sum(l.A.shape[0] for l in levels)
    sum_nnz = sum(l.A.nnz for l in levels)

    lines = []
    lines.append(f"Number of levels:    {len(levels)}")
    lines.append(f"Operator complexity: {sum_nnz / max(nnz0, 1):.2f}")
    lines.append(f"Grid complexity:     {sum_rows / max(rows0, 1):.2f}")
    lines.append("")
    lines.append("level     unknowns       nonzeros      memory")
    lines.append("---------------------------------------------")
    for i, l in enumerate(levels):
        mem = l.A.nbytes
        if l.P is not None:
            mem += l.P.nbytes + l.R.nbytes
        if l.coarse_inv is not None:
            mem += l.coarse_inv.size * l.coarse_inv.dtype.itemsize
        frac = 100.0 * l.A.nnz / max(sum_nnz, 1)
        lines.append(
            f"{i:5d} {l.A.shape[0]:12d} {l.A.nnz:14d} {_human_bytes(mem)}"
            f" ({frac:5.2f}%)"
        )
    return "\n".join(lines)
