"""Line-coverage runner for pawsometracker_tpu (no external deps).

The reference project gates CI on 90% coverage (codecov.yml:4-9); this image
has neither coverage.py nor pytest-cov, so this tool measures line coverage
with the stdlib ``sys.monitoring`` API (PEP 669, Python >= 3.12): LINE events
are enabled only for files inside the package (every other code location is
disabled at first hit, so the overhead stays small), and the executable-line
denominator comes from walking each module's compiled code objects.

Usage:
    python tools/pawscov.py [--min PCT] [pytest args...]

Exits non-zero when total coverage is below ``--min`` (default 90).
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "pawsometracker_tpu")
if REPO not in sys.path:  # `python tools/pawscov.py` puts tools/ first, not the repo
    sys.path.insert(0, REPO)

seen: dict[str, set[int]] = defaultdict(set)


def _install():
    mon = sys.monitoring
    tool = mon.COVERAGE_ID
    mon.use_tool_id(tool, "pawscov")

    def on_line(code, line):
        fn = code.co_filename
        if fn.startswith(PKG):
            seen[fn].add(line)
        # line coverage needs ONE hit per location: disabling after the
        # first hit (package lines included) removes the per-execution
        # Python callback from every hot loop for the rest of the suite
        return mon.DISABLE

    mon.register_callback(tool, mon.events.LINE, on_line)
    mon.set_events(tool, mon.events.LINE)


def executable_lines(path: str) -> set[int]:
    """All line numbers that carry bytecode in ``path`` (nested code included)."""
    with open(path, "rb") as f:
        src = f.read()
    try:
        top = compile(src, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def report(min_pct: float) -> int:
    rows = []
    tot_hit = tot_all = 0
    for root, dirs, files in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            path = os.path.join(root, name)
            exe = executable_lines(path)
            if not exe:
                continue
            hit = seen.get(path, set()) & exe
            rows.append((os.path.relpath(path, REPO), len(hit), len(exe)))
            tot_hit += len(hit)
            tot_all += len(exe)
    width = max(len(r[0]) for r in rows) + 2
    print(f"\n{'file'.ljust(width)} {'lines':>7} {'hit':>7} {'cov%':>7}")
    for path, hit, exe in rows:
        print(f"{path.ljust(width)} {exe:>7} {hit:>7} {100.0 * hit / exe:>6.1f}%")
    pct = 100.0 * tot_hit / max(tot_all, 1)
    print(f"{'TOTAL'.ljust(width)} {tot_all:>7} {tot_hit:>7} {pct:>6.1f}%")
    print(f"coverage: {pct:.1f}% (target {min_pct:.0f}%)")
    return 0 if pct >= min_pct else 1


def main() -> int:
    argv = sys.argv[1:]
    min_pct = 90.0
    if "--min" in argv:
        i = argv.index("--min")
        min_pct = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2 :]
    _install()
    import pytest

    rc = pytest.main(argv or ["tests/", "-q", "-x"])
    sys.monitoring.set_events(sys.monitoring.COVERAGE_ID, 0)
    cov_rc = report(min_pct)
    return rc or cov_rc


if __name__ == "__main__":
    raise SystemExit(main())
