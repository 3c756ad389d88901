"""Partitioned-HLO audit: prove "zero collectives inside the ODE loop".

The framework's central multi-chip performance claim (`parallel/mesh.py`:
sharding the MC-sample and sequence axes shards the flattened shooting-segment
batch with NO cross-device traffic inside the solver scan; collectives exist
only in the ELBO/grad reductions) was previously asserted in prose and by
value-parity tests. This module checks it structurally: parse the compiled,
SPMD-partitioned HLO of a sharded train step, locate every `while` loop (XLA
lowers `lax.scan`/`lax.while_loop` to `while`), and walk each loop's body and
condition computations TRANSITIVELY (through fusions/calls/nested loops) for
collective instructions.

Used by `tests/test_hlo_collectives.py` on the 8-device CPU mesh (GSPMD
partitioning on CPU emits the same collective ops a TPU slice would get) and
by `__graft_entry__.dryrun_multichip`, so every driver artifact re-verifies
the claim.
"""

from __future__ import annotations

import re
from typing import Dict, List, Set

# async variants included: all-reduce-start/-done etc.
_COLLECTIVE_RE = re.compile(
    r"\b(all-reduce|all-gather|all-to-all|collective-permute"
    r"|collective-broadcast|reduce-scatter|ragged-all-to-all)"
    r"(-start|-done|-update)?\(")

# a computation reference: body=%name, condition=%name, to_apply=%name,
# calls=%name, or branch_computations={%a, %b}
_CALL_REF_RE = re.compile(
    r"(?:body|condition|to_apply|calls|inner)=%([\w\.\-]+)")
_BRANCH_RE = re.compile(r"branch_computations=\{([^}]*)\}")
_WHILE_RE = re.compile(
    r"\bwhile\(%[\w\.\-]+\), condition=%([\w\.\-]+), body=%([\w\.\-]+)")
_OP_NAME_RE = re.compile(r"op_name=\"([^\"]*)\"")


def parse_computations(hlo_text: str) -> Dict[str, List[str]]:
    """Split HLO module text into {computation_name: [instruction lines]}.

    Computations start at column 0 as `%name (params) -> type {` or
    `ENTRY %name (...) -> type {` and end at a column-0 `}`.
    """
    comps: Dict[str, List[str]] = {}
    name = None
    for line in hlo_text.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\{\s*$", line)
            if m:
                name = m.group(1)
                comps[name] = []
                continue
            if line.startswith("}"):
                name = None
                continue
        if name is not None:
            comps[name] = comps.get(name, [])
            comps[name].append(line)
    return comps


def _callees(lines: List[str]) -> Set[str]:
    refs: Set[str] = set()
    for line in lines:
        for m in _CALL_REF_RE.finditer(line):
            refs.add(m.group(1))
        for m in _BRANCH_RE.finditer(line):
            for part in m.group(1).split(","):
                part = part.strip().lstrip("%")
                if part:
                    refs.add(part)
    return refs


def _reachable(comps: Dict[str, List[str]], roots: Set[str]) -> Set[str]:
    seen: Set[str] = set()
    stack = [r for r in roots if r in comps]
    while stack:
        cur = stack.pop()
        if cur in seen:
            continue
        seen.add(cur)
        for ref in _callees(comps.get(cur, [])):
            if ref in comps and ref not in seen:
                stack.append(ref)
    return seen


def _collectives_in(comps: Dict[str, List[str]], names: Set[str]) -> List[str]:
    found = []
    for n in sorted(names):
        for line in comps.get(n, []):
            m = _COLLECTIVE_RE.search(line)
            if m:
                found.append(f"{n}: {line.strip()[:160]}")
    return found


def audit_loops_for_collectives(hlo_text: str) -> dict:
    """Audit a compiled HLO module: collectives inside loop bodies vs outside.

    Returns {
      'loops': [{'op_name', 'body', 'collectives': [...]}, ...],
      'num_loops': int,
      'loop_collectives': int,      # total collectives found inside loops
      'module_collectives': int,    # collectives anywhere in the module
    }
    A sharded train step must have module_collectives > 0 (the grad/ELBO
    reductions) and loop_collectives == 0 (nothing inside the solver scans).
    """
    comps = parse_computations(hlo_text)
    loops = []
    for name, lines in comps.items():
        for line in lines:
            m = _WHILE_RE.search(line)
            if m is None:
                continue
            cond, body = m.group(1), m.group(2)
            mo = _OP_NAME_RE.search(line)
            op_name = mo.group(1) if mo else ""
            inside = _reachable(comps, {cond, body})
            loops.append({
                "op_name": op_name,
                "body": body,
                "collectives": _collectives_in(comps, inside),
            })
    module_coll = sum(
        1 for lines in comps.values() for line in lines
        if _COLLECTIVE_RE.search(line))
    return {
        "loops": loops,
        "num_loops": len(loops),
        "loop_collectives": sum(len(l["collectives"]) for l in loops),
        "module_collectives": module_coll,
    }


def assert_ode_loops_collective_free(hlo_text: str, *,
                                     solver_loop_marker: str = "shard_map/while",
                                     require_module_collectives: bool = True):
    """Raise AssertionError unless every while loop in the module is
    collective-free, with sanity checks that the audit is not vacuous:
    the SOLVER scan is present (a loop whose op_name contains
    `solver_loop_marker` — both sharded step styles run the segment
    integration inside a shard_map region, so its scan lowers with that
    marker; pass e.g. "/while" for unsharded programs) and the module does
    contain collectives (the ELBO/grad reductions)."""
    report = audit_loops_for_collectives(hlo_text)
    offenders = [l for l in report["loops"] if l["collectives"]]
    assert not offenders, (
        "collectives found INSIDE loop bodies:\n" + "\n".join(
            f"  loop {l['op_name']} ({l['body']}):\n    " +
            "\n    ".join(l["collectives"]) for l in offenders))
    assert any(solver_loop_marker in l["op_name"] for l in report["loops"]), (
        f"no loop with op_name containing {solver_loop_marker!r} — the "
        f"solver scan was not found; audit vacuous. Loops seen: "
        f"{[l['op_name'] for l in report['loops']]}")
    if require_module_collectives:
        assert report["module_collectives"] > 0, (
            "no collectives anywhere — module not actually partitioned; "
            "audit vacuous")
    return report
