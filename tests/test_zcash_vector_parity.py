"""Prove the committed zcash KAT fixtures are the COMPLETE reference suites.

Parses the reference fixture file
(/root/reference/circuits/src/poseidon/primitives/test_vectors.rs — itself
generated from zcash-hackworks/zcash-test-vectors orchard_poseidon) at test
time and asserts the committed `tests/poseidon_zcash_vectors.py` lists are
byte-identical and the VECTOR COUNTS MATCH (the round-3 review asked for the
full suites, not a subset: the reference holds exactly 11 permute + 11 hash
vectors per field and all 44 are asserted by tests/test_pasta_poseidon.py).

Skips when the reference tree is absent (the framework stands alone).
"""

import os
import re

import pytest

from poseidon_zcash_vectors import FP_HASH, FP_PERMUTE, FQ_HASH, FQ_PERMUTE

REF = "/root/reference/circuits/src/poseidon/primitives/test_vectors.rs"


def _parse_reference():
    """Extract (fp_permute, fp_hash, fq_permute, fq_hash) as little-endian
    ints from the Rust fixture source."""
    with open(REF) as f:
        src = f.read()

    def byte_arrays(text):
        """All [...] byte arrays (32 comma-separated 0x.. bytes) in order."""
        out = []
        for m in re.finditer(r"\[\s*((?:0x[0-9a-fA-F]{2},?\s*){32})\]", text):
            bs = [int(b, 16) for b in re.findall(r"0x[0-9a-fA-F]{2}", m.group(1))]
            out.append(int.from_bytes(bytes(bs), "little"))
        return out

    fp_start = src.index("pub(crate) mod fp")
    fq_start = src.index("pub(crate) mod fq")
    sections = []
    for mod_src in (src[fp_start:fq_start], src[fq_start:]):
        perm_start = mod_src.index("fn permute")
        hash_start = mod_src.index("fn hash")
        perm_vals = byte_arrays(mod_src[perm_start:hash_start])
        hash_vals = byte_arrays(mod_src[hash_start:])
        assert len(perm_vals) % 6 == 0 and len(hash_vals) % 3 == 0
        permutes = [
            (perm_vals[i : i + 3], perm_vals[i + 3 : i + 6])
            for i in range(0, len(perm_vals), 6)
        ]
        hashes = [
            (hash_vals[i : i + 2], hash_vals[i + 2])
            for i in range(0, len(hash_vals), 3)
        ]
        sections.append((permutes, hashes))
    return sections[0][0], sections[0][1], sections[1][0], sections[1][1]


@pytest.mark.skipif(not os.path.exists(REF), reason="reference tree absent")
def test_fixture_counts_and_bytes_match_reference():
    fp_perm, fp_hash, fq_perm, fq_hash = _parse_reference()
    # counts: every vector in the reference file is present
    assert len(FP_PERMUTE) == len(fp_perm)
    assert len(FP_HASH) == len(fp_hash)
    assert len(FQ_PERMUTE) == len(fq_perm)
    assert len(FQ_HASH) == len(fq_hash)
    # values: byte-identical (as LE ints)
    for (got_i, got_f), (exp_i, exp_f) in zip(FP_PERMUTE, fp_perm):
        assert list(got_i) == exp_i and list(got_f) == exp_f
    for (got_m, got_o), (exp_m, exp_o) in zip(FP_HASH, fp_hash):
        assert list(got_m) == exp_m and got_o == exp_o
    for (got_i, got_f), (exp_i, exp_f) in zip(FQ_PERMUTE, fq_perm):
        assert list(got_i) == exp_i and list(got_f) == exp_f
    for (got_m, got_o), (exp_m, exp_o) in zip(FQ_HASH, fq_hash):
        assert list(got_m) == exp_m and got_o == exp_o
