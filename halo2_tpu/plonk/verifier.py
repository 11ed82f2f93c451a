"""The PLONKish verifier.

Equivalent of the reference's external `verify_proof` with `SingleStrategy`
(SURVEY.md 3.3): replays the transcript, recomputes every challenge,
reconstructs the expected quotient evaluation h(x) from the gate/permutation
constraint evaluations, and delegates the batched opening check to the
GWC / SHPLONK verifier (single pairing product on the host).

Instance polynomial evaluations are computed by the verifier itself from the
public inputs via Lagrange interpolation (KZG does not query instances —
reference behavior, SURVEY.md 3.2 note on QUERY_INSTANCE).
"""

from __future__ import annotations

from ..commit import gwc, shplonk
from ..commit.srs import ParamsKZG
from ..field.bn254 import FR_MOD
from ..frontend.expression import evaluate
from ..transcript import Blake2bRead
from .evaluation import pow_delta
from .keygen import VerifyingKey


def verify_proof(
    params: ParamsKZG,
    vk: VerifyingKey,
    proof: bytes,
    instances: list[list[int]],
    scheme: str = "gwc",
) -> bool:
    try:
        return _verify(params, vk, proof, instances, scheme)
    except (ValueError, AssertionError, ZeroDivisionError):
        return False


def _verify(params, vk, proof, instances, scheme) -> bool:
    cs = vk.cs
    dom = vk.domain
    n = 1 << vk.k
    bf = cs.blinding_factors()
    u = vk.usable_row
    num_chunks = cs.num_permutation_chunks() if cs.permutation_columns else 0

    t = Blake2bRead(proof)
    t.common_scalar(vk.transcript_repr)
    instances = [[v % FR_MOD for v in col] for col in instances]
    if len(instances) != cs.num_instance:
        return False
    for col in instances:
        if len(col) > u:
            return False
        for v in col:
            t.common_scalar(v)

    advice_commitments = [t.read_point() for _ in range(cs.num_advice)]
    theta = t.squeeze_challenge()
    lookup_perm_commitments = [
        (t.read_point(), t.read_point()) for _ in cs.lookups
    ]
    beta = t.squeeze_challenge()
    gamma = t.squeeze_challenge()
    z_commitments = [t.read_point() for _ in range(num_chunks)]
    lookup_z_commitments = [t.read_point() for _ in cs.lookups]
    random_commitment = t.read_point()
    y = t.squeeze_challenge()
    qd = cs.degree() - 1
    h_commitments = [t.read_point() for _ in range(qd)]
    x = t.squeeze_challenge()
    x_next = dom.rotate_omega(x, 1)
    x_last = dom.rotate_omega(x, -(bf + 1))
    x_inv = dom.rotate_omega(x, -1)

    advice_evals = [t.read_scalar() for _ in cs.advice_queries]
    fixed_evals = [t.read_scalar() for _ in cs.fixed_queries]
    random_eval = t.read_scalar()
    sigma_evals = [t.read_scalar() for _ in cs.permutation_columns]
    z_evals = []
    for i in range(num_chunks):
        entry = {"x": t.read_scalar(), "next": t.read_scalar()}
        if i < num_chunks - 1:
            entry["last"] = t.read_scalar()
        z_evals.append(entry)
    lookup_evals = []
    for _ in cs.lookups:
        lookup_evals.append(
            {
                "z": t.read_scalar(),
                "z_next": t.read_scalar(),
                "a": t.read_scalar(),
                "a_inv": t.read_scalar(),
                "s": t.read_scalar(),
            }
        )

    # ---- instance evals at the queried rotations (computed, not read) ----------
    instance_evals = []
    for (col, rot) in cs.instance_queries:
        pt = dom.rotate_omega(x, rot)
        vals = instances[col]
        ev = 0
        for row, vv in enumerate(vals):
            if vv:
                ev = (ev + vv * dom.eval_lagrange(row, pt)) % FR_MOD
        instance_evals.append(ev)

    # ---- expected h(x) ------------------------------------------------------------
    aq_index = {q: i for i, q in enumerate(cs.advice_queries)}
    fq_index = {q: i for i, q in enumerate(cs.fixed_queries)}
    iq_index = {q: i for i, q in enumerate(cs.instance_queries)}

    def eval_gate(poly):
        return evaluate(
            poly,
            constant=lambda v: v,
            fixed=lambda q: fixed_evals[q.query_index],
            advice=lambda q: advice_evals[q.query_index],
            instance=lambda q: instance_evals[q.query_index],
            selector=lambda q: (_ for _ in ()).throw(AssertionError("selector")),
            add=lambda a, b: (a + b) % FR_MOD,
            mul=lambda a, b: (a * b) % FR_MOD,
            neg=lambda a: (-a) % FR_MOD,
            scale=lambda a, s: (a * s) % FR_MOD,
        )

    value = 0
    for gate in cs.gates:
        for poly in gate.polys:
            value = (value * y + eval_gate(poly)) % FR_MOD

    l0 = dom.eval_lagrange(0, x)
    l_last = dom.eval_lagrange(u, x)
    l_blind = 0
    for i in range(u + 1, n):
        l_blind = (l_blind + dom.eval_lagrange(i, x)) % FR_MOD
    l_active = (1 - (l_last + l_blind)) % FR_MOD

    if cs.permutation_columns:
        value = (value * y + l0 * (1 - z_evals[0]["x"])) % FR_MOD
        zl = z_evals[-1]["x"]
        value = (value * y + l_last * (zl * zl - zl)) % FR_MOD
        for i in range(1, num_chunks):
            value = (
                value * y + l0 * (z_evals[i]["x"] - z_evals[i - 1]["last"])
            ) % FR_MOD

        chunk_len = cs.permutation_chunk_len()

        def col_eval(column):
            if column.kind == "advice":
                return advice_evals[aq_index[(column.index, 0)]]
            if column.kind == "fixed":
                return fixed_evals[fq_index[(column.index, 0)]]
            return instance_evals[iq_index[(column.index, 0)]]

        for ci in range(num_chunks):
            s = ci * chunk_len
            e = min(s + chunk_len, len(cs.permutation_columns))
            left = z_evals[ci]["next"]
            right = z_evals[ci]["x"]
            for j in range(s, e):
                v_j = col_eval(cs.permutation_columns[j])
                left = left * ((v_j + beta * sigma_evals[j] + gamma) % FR_MOD) % FR_MOD
                right = (
                    right * ((v_j + beta * pow_delta(j) * x + gamma) % FR_MOD) % FR_MOD
                )
            value = (value * y + l_active * (left - right)) % FR_MOD

    for li, (_name, pairs) in enumerate(cs.lookups):
        ev = lookup_evals[li]
        a_comp = 0
        for e, _te in pairs:
            a_comp = (a_comp * theta + eval_gate(e)) % FR_MOD
        s_comp = 0
        for _ie, e in pairs:
            s_comp = (s_comp * theta + eval_gate(e)) % FR_MOD
        value = (value * y + l0 * (1 - ev["z"])) % FR_MOD
        value = (value * y + l_last * (ev["z"] * ev["z"] - ev["z"])) % FR_MOD
        left = ev["z_next"] * ((ev["a"] + beta) % FR_MOD) % FR_MOD * (
            (ev["s"] + gamma) % FR_MOD
        ) % FR_MOD
        right = ev["z"] * ((a_comp + beta) % FR_MOD) % FR_MOD * (
            (s_comp + gamma) % FR_MOD
        ) % FR_MOD
        value = (value * y + l_active * (left - right)) % FR_MOD
        value = (value * y + l0 * (ev["a"] - ev["s"])) % FR_MOD
        value = (
            value * y
            + l_active * ((ev["a"] - ev["s"]) % FR_MOD) * ((ev["a"] - ev["a_inv"]) % FR_MOD)
        ) % FR_MOD

    zh_x = (pow(x, n, FR_MOD) - 1) % FR_MOD
    if zh_x == 0:
        return False
    expected_h = value * pow(zh_x, -1, FR_MOD) % FR_MOD

    # ---- multiopen queries (same labeled order as the prover) ---------------------
    queries = []
    for qi, (col, rot) in enumerate(cs.advice_queries):
        pt = dom.rotate_omega(x, rot)
        queries.append((f"advice{col}", advice_commitments[col], pt, advice_evals[qi]))
    for i in range(num_chunks):
        queries.append((f"z{i}", z_commitments[i], x, z_evals[i]["x"]))
        queries.append((f"z{i}", z_commitments[i], x_next, z_evals[i]["next"]))
    for i in range(num_chunks - 2, -1, -1):
        queries.append((f"z{i}", z_commitments[i], x_last, z_evals[i]["last"]))
    for li in range(len(cs.lookups)):
        ev = lookup_evals[li]
        a_com, s_com = lookup_perm_commitments[li]
        queries.append((f"lz{li}", lookup_z_commitments[li], x, ev["z"]))
        queries.append((f"la{li}", a_com, x, ev["a"]))
        queries.append((f"ls{li}", s_com, x, ev["s"]))
        queries.append((f"la{li}", a_com, x_inv, ev["a_inv"]))
        queries.append((f"lz{li}", lookup_z_commitments[li], x_next, ev["z_next"]))
    for qi, (col, rot) in enumerate(cs.fixed_queries):
        pt = dom.rotate_omega(x, rot)
        queries.append((f"fixed{col}", vk.fixed_commitments[col], pt, fixed_evals[qi]))
    for i in range(len(cs.permutation_columns)):
        queries.append((f"sigma{i}", vk.permutation_commitments[i], x, sigma_evals[i]))
    h_msm = (
        "msm",
        [
            (h_commitments[i], pow(x, n * i, FR_MOD))
            for i in range(qd)
            if h_commitments[i] is not None
        ],
    )
    queries.append(("h", h_msm, x, expected_h))
    queries.append(("random", random_commitment, x, random_eval))

    if scheme == "gwc":
        ok = gwc.verify_gwc(params, t, queries)
    elif scheme == "shplonk":
        ok = shplonk.verify_shplonk(params, t, queries)
    else:
        raise ValueError(f"unknown multiopen scheme {scheme}")
    if not ok:
        return False
    t.assert_consumed()
    return True
