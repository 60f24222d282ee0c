"""Source fingerprints for past-window registry entries.

The driver's correctness harness records rows for only the first
``queries.DRIVER_WINDOW`` registry entries; entries beyond it rely on
a prior green round PLUS the discipline that their implementing code
is untouched. This tool makes that discipline mechanical: it computes
a fingerprint per registry entry over

* the builder function's source,
* the resolved oracle SQL (or the generator's source),
* the source of every ``pcornet_data_curation_spark`` function/module
  the builder references — bare names resolved through the queries
  module's globals (top-level imports like ``lsh_topk``/``TA``) and
  ``from pcornet_data_curation_spark.x import …`` statements inside
  the builder body (in-body operator imports), plus the repr of plain
  module-level constants (fixture vectors, literal tables).

``python tools/pin_registry.py --update`` rewrites
``tests/registry_pins.json`` with fingerprints for every entry
currently PAST the window; ``tests/test_entry_contract.py`` fails if
a past-window entry's fingerprint drifts from the pinned one (the fix
is to rotate the entry back into the head-50 and refresh the pins).

EVIDENCE STANDARD for a pin refresh (round 6): a pin attests "this
source was oracle-verified". When an edit touches shared helpers
behind more past-window entries than the 50-slot window can re-verify
(round 6's scan floor in queries._t reached all 34), the refresh must
be accompanied by a full ``tools/check_oracle.py`` run over the whole
registry on the refreshed tree — the judge can replay it — and the
round notes must say so (OPTIMIZATION_r06.md). A pin refresh without
either a driver row or a full oracle run is not evidence.
"""

from __future__ import annotations

import hashlib
import importlib
import inspect
import json
import os
import re
import sys

PINS_PATH = os.path.join(os.path.dirname(__file__), "..", "tests", "registry_pins.json")

_IMPORT_RE = re.compile(
    r"from\s+(pcornet_data_curation_spark[\w.]*)\s+import\s+([\w,\s()]+)"
)


def entry_fingerprint(name: str) -> str:
    from pcornet_data_curation_spark import queries as Q

    builder, sql = Q.REGISTRY[name]
    seen: set[str] = set()
    parts: list[str] = []

    def add(tag: str, text: str) -> None:
        if tag not in seen:
            seen.add(tag)
            parts.append(f"## {tag}\n{text}")

    src = inspect.getsource(builder)
    add(f"builder:{builder.__name__}", src)

    # in-body imports -> whole-module source (operator implementations)
    for m in _IMPORT_RE.finditer(src):
        mod = importlib.import_module(m.group(1))
        add(f"module:{mod.__name__}", inspect.getsource(mod))

    # bare names resolved via the queries module globals (depth-1)
    for tok in sorted(set(re.findall(r"\b[A-Za-z_]\w*\b", src))):
        obj = getattr(Q, tok, None)
        if obj is None or tok == builder.__name__:
            continue
        if inspect.ismodule(obj) and obj.__name__.startswith(
            "pcornet_data_curation_spark"
        ):
            add(f"module:{obj.__name__}", inspect.getsource(obj))
        elif inspect.isfunction(obj) and obj.__module__.startswith(
            "pcornet_data_curation_spark"
        ):
            add(f"fn:{obj.__module__}.{obj.__name__}", inspect.getsource(obj))
        elif isinstance(obj, (str, int, float, list, tuple, dict)):
            add(f"const:{tok}", repr(obj))

    if callable(sql):
        add("oracle:gen", inspect.getsource(sql))
    elif sql is not None:
        add("oracle:sql", sql)

    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


def past_window_names() -> list[str]:
    from pcornet_data_curation_spark import queries as Q

    return list(Q.REGISTRY)[Q.DRIVER_WINDOW:]


def main() -> int:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    pins = {n: entry_fingerprint(n) for n in past_window_names()}
    if "--update" in sys.argv:
        with open(PINS_PATH, "w") as f:
            json.dump(pins, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(pins)} pins -> {PINS_PATH}")
        return 0
    with open(PINS_PATH) as f:
        stored = json.load(f)
    stale = {n for n in pins if stored.get(n) != pins[n]}
    missing = set(pins) - set(stored)
    for n in sorted(stale | missing):
        print(f"DRIFT {n}: pinned={stored.get(n)} current={pins[n]}")
    print(f"{len(pins) - len(stale | missing)}/{len(pins)} pins match")
    return 1 if (stale | missing) else 0


if __name__ == "__main__":
    raise SystemExit(main())
