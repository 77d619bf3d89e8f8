"""Per-particle atom-type features for molecule-aware backbones.

Reference parity: the hard-coded peptide atom-type groupings of
``egnn_aldp.py:53-80`` and ``torchmd_net/model_dynamics.py:655-744``
(``get_h_initial``): every atom gets a distinct type except symmetric methyl
hydrogens, which share one type per methyl group. Here the grouping is derived
from the topology instead of hard-coded per atom count: hydrogens bonded to
the same carbon share a type.
"""

from typing import Tuple


def peptide_atom_types(topology) -> Tuple[int, ...]:
    """Integer type per atom; symmetric (same-parent) hydrogens share types."""
    names = topology["names"]
    types = topology["types"]
    bonds = topology["bonds"]
    n = len(names)
    parent = {}
    for a, b in bonds:
        if types[a].startswith("H"):
            parent[a] = b
        if types[b].startswith("H"):
            parent[b] = a
    out = []
    group_of_parent = {}
    next_type = 0
    for i in range(n):
        if types[i].startswith("H") and i in parent:
            p = parent[i]
            key = ("H", p)
            if key not in group_of_parent:
                group_of_parent[key] = next_type
                next_type += 1
            out.append(group_of_parent[key])
        else:
            out.append(next_type)
            next_type += 1
    return tuple(out)
