"""Named groups of dynamic tables (SURVEY.md C11; README.md:2
"lookuptable-style ... Embedding").

The reference class of systems (TF dynamic-embedding) lets a model own
SEVERAL logical tables with different dims/optimizers/policies — one per
feature family (user ids at dim 64, item ids at dim 32, ...). The trainers
in this build use the equally idiomatic single shared namespaced table
(data/criteo.py ids carry `feature << 44`); TableGroup is the heterogeneous
alternative for library users: a dict of independently configured
DynamicEmbeddingTables behind one lookup/update/checkpoint surface.

Checkpoint layout: <path>/group.json (names + per-table relative dirs) with
each member's elastic checkpoint in its own subdirectory — every member
remains individually restorable/reshardable with the normal machinery.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from meepoembedding_tpu.config import TableConfig
from meepoembedding_tpu.table.runtime import DynamicEmbeddingTable


class TableGroup:
    def __init__(self, configs: Dict[str, TableConfig], spills: Optional[dict] = None):
        assert configs, "TableGroup needs at least one table"
        spills = spills or {}
        self.tables: Dict[str, DynamicEmbeddingTable] = {
            name: DynamicEmbeddingTable(cfg, spill=spills.get(name))
            for name, cfg in configs.items()
        }

    def __getitem__(self, name: str) -> DynamicEmbeddingTable:
        return self.tables[name]

    def __iter__(self):
        return iter(self.tables)

    def lookup(self, name: str, ids64: np.ndarray, train: bool = True):
        return self.tables[name].lookup(ids64, train=train)

    def apply_grads(self, name: str, grads):
        return self.tables[name].apply_grads(grads)

    def remove(self, name: str, ids64: np.ndarray) -> int:
        return self.tables[name].remove(ids64)

    def evict(self) -> Dict[str, int]:
        return {n: t.evict() for n, t in self.tables.items()}

    def counters(self) -> Dict[str, dict]:
        return {n: t.counters() for n, t in self.tables.items()}

    def __len__(self) -> int:
        return sum(len(t) for t in self.tables.values())

    # --- checkpoint (each member keeps its own elastic format) --------------
    def save(self, path: str, extras: Optional[dict] = None) -> dict:
        os.makedirs(path, exist_ok=True)
        manifest = {"tables": {}, "extras": extras or {}}
        for name, t in self.tables.items():
            sub = os.path.join(path, f"table-{name}")
            t.save(sub)
            manifest["tables"][name] = f"table-{name}"
        tmp = os.path.join(path, ".group.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(path, "group.json"))
        return manifest

    def load(self, path: str) -> dict:
        with open(os.path.join(path, "group.json")) as f:
            manifest = json.load(f)
        names = set(manifest["tables"])
        assert names == set(self.tables), (
            f"group mismatch: checkpoint has {sorted(names)}, "
            f"group has {sorted(self.tables)}"
        )
        for name, sub in manifest["tables"].items():
            self.tables[name].load(os.path.join(path, sub))
        return manifest
