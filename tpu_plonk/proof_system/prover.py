"""The 5-round PLONK prover (host reference engine; SURVEY.md §3.2).

Round structure (transcript interleavings marked ->):
  0  preprocess done separately; transcript seeded with circuit size
  1  commit w_l w_r w_o w_4            -> beta (re-appended), gamma
  2  grand product z, commit           -> alpha + widget separations
  3  quotient on 4n coset, split t1..t4, commit
                                       -> zeta
  4  evaluations at zeta / zeta*omega; linearization poly r; t_eval
                                       -> v (aggregation)
  5  two aggregate KZG witnesses W_z, W_zw

The device engine (proof_system/engine_device.py) replaces rounds 1-3
and 5's polynomial math with TPU NTT/MSM kernels; this module is the
bit-exact reference and the small-circuit path.
"""

from ..params import R_MOD, K1, K2, K3
from ..fields import fr
from ..poly import poly
from ..transcript import Transcript
from ..transcript import labels as L
from ..pcs import kzg
from . import constraints as C
from .proof import Proof

KS = (1, K1, K2, K3)


def _blinders(seed: bytes, count: int):
    """Deterministic seed-derived blinding scalars (keeps proofs
    reproducible for a fixed seed — byte-identity tests survive — while
    making distinct-seed proofs statistically hiding).  The seed MUST
    be secret and fresh per proof for zero-knowledge."""
    import hashlib
    return [int.from_bytes(
        hashlib.sha512(b"tpu-plonk blind" + seed
                       + k.to_bytes(2, "little")).digest(),
        "little") % R_MOD for k in range(count)]


def _add_zh_mult(coeffs, bs, n: int):
    """coeffs + (sum_k bs[k] X^k) * (X^n - 1) — the standard PLONK
    blinding shape: the added term vanishes on H, so evaluations over
    the domain (and hence the constraint algebra on H) are unchanged."""
    out = list(coeffs) + [0] * max(0, n + len(bs) - len(coeffs))
    for k, b in enumerate(bs):
        out[n + k] = (out[n + k] + b) % R_MOD
        out[k] = (out[k] - b) % R_MOD
    return out


def prove(composer, pk, srs, label: bytes = L.PROTOCOL,
          ckpt=None, blinding_seed: bytes = None,
          challenge_trace: dict = None) -> Proof:
    """5-round prover.  Optional `ckpt` (utils.checkpoint.RoundCheckpoint)
    persists each round's outputs; on restart, completed rounds load
    from disk and the transcript replays deterministically from the
    cached commitments (SURVEY.md §5.4).

    `blinding_seed` switches on the ZK variant: wires gain
    (b1 X + b2) Z_H, z gains (b1 X^2 + b2 X + b3) Z_H, pushing deg(t)
    to 4n+6 — the quotient is computed on an 8n coset and split into
    FIVE chunks (extra commitment t_5, 1088-byte proof; docs/PROTOCOL.md
    §zk).  Without a seed the prover stays deterministic and
    byte-compatible with the dusk-parity 1040-byte layout."""
    n = pk.n
    dom = pk.domain
    ext = pk.ext_domain
    blinds = _blinders(blinding_seed, 11) if blinding_seed is not None \
        else None

    def _memo(key, fn):
        return fn() if ckpt is None else ckpt.memo(key, fn)

    t = Transcript(label)
    t.circuit_domain_sep(n)

    # ------------------------------------------------------ round 1
    def _round1():
        wire_vals = {w: [composer.witness[v] for v in pk.wire_vars[w]]
                     for w in "abcd"}
        wire_coeffs = {w: dom.intt(wire_vals[w]) for w in "abcd"}
        if blinds is not None:
            for j, w in enumerate("abcd"):
                wire_coeffs[w] = _add_zh_mult(
                    wire_coeffs[w], blinds[2 * j:2 * j + 2], n)
        comms = {
            "w_l": kzg.commit(wire_coeffs["a"], srs),
            "w_r": kzg.commit(wire_coeffs["b"], srs),
            "w_o": kzg.commit(wire_coeffs["c"], srs),
            "w_4": kzg.commit(wire_coeffs["d"], srs),
        }
        return wire_vals, wire_coeffs, comms

    wire_vals, wire_coeffs, r1_comms = _memo("r1", _round1)
    comm = dict(r1_comms)
    for lbl, name in ((L.W_L, "w_l"), (L.W_R, "w_r"),
                      (L.W_O, "w_o"), (L.W_4, "w_4")):
        t.append_commitment(lbl, comm[name])
    beta = t.challenge_scalar(L.BETA)
    t.append_scalar(L.BETA, beta)
    gamma = t.challenge_scalar(L.GAMMA)

    # ------------------------------------------------------ round 2
    def _round2():
        sigma_evals = [dom.ntt(sc) for sc in pk.sigma_coeffs]
        omegas = dom.elements()
        nums, dens = [], []
        for i in range(n):
            num = den = 1
            for j, w in enumerate("abcd"):
                wv = wire_vals[w][i]
                num = num * ((wv + beta * KS[j] * omegas[i] + gamma)
                             % R_MOD) % R_MOD
                den = den * ((wv + beta * sigma_evals[j][i] + gamma)
                             % R_MOD) % R_MOD
            nums.append(num)
            dens.append(den)
        den_invs = fr.batch_inv(dens)
        z_vals = [1] * n
        for i in range(n - 1):
            z_vals[i + 1] = z_vals[i] * nums[i] % R_MOD * den_invs[i] \
                % R_MOD
        assert z_vals[-1] * nums[-1] % R_MOD * den_invs[-1] % R_MOD == 1, \
            "grand product does not close (copy constraints violated)"
        z_coeffs = dom.intt(z_vals)
        if blinds is not None:
            z_coeffs = _add_zh_mult(z_coeffs, blinds[8:11], n)
        return z_coeffs, kzg.commit(z_coeffs, srs)

    z_coeffs, comm["z"] = _memo("r2", _round2)
    t.append_commitment(L.Z, comm["z"])
    alpha = t.challenge_scalar(L.ALPHA)
    ch = {
        "range": t.challenge_scalar(L.RANGE_SEP),
        "logic": t.challenge_scalar(L.LOGIC_SEP),
        "fixed": t.challenge_scalar(L.FIXED_SEP),
        "vgadd": t.challenge_scalar(L.VGADD_SEP),
    }

    # ------------------------------------------------------ round 3
    def _quotient_evals(ext_n, step, wire_ext, z_ext, pi_ext, sel_ext,
                        sigma_ext, pts, zh_inv, l1_ext):
        """t evaluations over a coset of size ext_n; `step` is the
        index offset realizing X -> X*omega on that coset (4 on the 4n
        coset, 8 on the blinded 8n coset)."""
        alpha2 = alpha * alpha % R_MOD
        t_evals = [0] * ext_n
        for i in range(ext_n):
            inx = (i + step) % ext_n
            w = tuple(wire_ext[c][i] for c in "abcd")
            wn = tuple(wire_ext[c][inx] for c in "abcd")
            q = {name: sel_ext[name][i] for name in sel_ext}
            gate = C.gate_value(w, wn, q, pi_ext[i], ch)

            x = pts[i]
            num = den = 1
            for j in range(4):
                num = num * ((w[j] + beta * KS[j] * x + gamma) % R_MOD) \
                    % R_MOD
                den = den * ((w[j] + beta * sigma_ext[j][i] + gamma)
                             % R_MOD) % R_MOD
            perm = (num * z_ext[i] - den * z_ext[inx]) % R_MOD
            l1_term = l1_ext[i] * ((z_ext[i] - 1) % R_MOD) % R_MOD
            total = (gate + alpha * perm + alpha2 * l1_term) % R_MOD
            t_evals[i] = total * zh_inv[i] % R_MOD
        return t_evals

    def _pi_coeffs():
        pi_vec = [0] * n
        for gi, val in composer.pi.items():
            pi_vec[gi] = val
        return dom.intt(pi_vec)

    def _round3():
        ext_n = 4 * n
        wire_ext = {w: ext.coset_ntt(wire_coeffs[w]) for w in "abcd"}
        z_ext = ext.coset_ntt(z_coeffs)
        pi_ext = ext.coset_ntt(_pi_coeffs())
        t_evals = _quotient_evals(
            ext_n, 4, wire_ext, z_ext, pi_ext, pk.selector_ext,
            pk.sigma_ext, pk.coset_points, pk.zh_inv_ext, pk.l1_ext)
        t_coeffs = ext.coset_intt(t_evals)
        assert all(c == 0 for c in t_coeffs[4 * n - 3:]), \
            "quotient degree overflow (constraint degree too high)"
        chunks = [t_coeffs[k * n:(k + 1) * n] for k in range(4)]
        return chunks, [kzg.commit(ck, srs) for ck in chunks]

    def _round3_blinded():
        """Blinded quotient: deg(t) = 4n+6 exceeds the 4n coset, so
        evaluate on an 8n coset (tables built on the fly — the host
        oracle prover is the small-circuit path) and split into FIVE
        chunks."""
        from ..poly.domain import Domain
        ext8 = Domain(8 * n)
        ext_n = 8 * n
        wire_ext = {w: ext8.coset_ntt(wire_coeffs[w]) for w in "abcd"}
        z_ext = ext8.coset_ntt(z_coeffs)
        pi_ext = ext8.coset_ntt(_pi_coeffs())
        sel_ext = {name: ext8.coset_ntt(pk.selector_coeffs[name])
                   for name in pk.selector_coeffs}
        sigma_ext = [ext8.coset_ntt(sc) for sc in pk.sigma_coeffs]
        pts = [0] * ext_n
        g = ext8.coset_gen
        for i in range(ext_n):
            pts[i] = g
            g = g * ext8.omega % R_MOD
        zh = [(pow(x, n, R_MOD) - 1) % R_MOD for x in pts]
        zh_inv = fr.batch_inv(zh)
        xm1_inv = fr.batch_inv([(x - 1) % R_MOD for x in pts])
        l1_ext = [zh[i] * dom.n_inv % R_MOD * xm1_inv[i] % R_MOD
                  for i in range(ext_n)]
        t_evals = _quotient_evals(
            ext_n, 8, wire_ext, z_ext, pi_ext, sel_ext, sigma_ext,
            pts, zh_inv, l1_ext)
        t_coeffs = ext8.coset_intt(t_evals)
        assert all(c == 0 for c in t_coeffs[4 * n + 7:]), \
            "blinded quotient degree overflow"
        chunks = [t_coeffs[k * n:(k + 1) * n] for k in range(4)]
        chunks.append(t_coeffs[4 * n:4 * n + 7])
        return chunks, [kzg.commit(ck, srs) for ck in chunks]

    chunks, t_comms = _memo(
        "r3", _round3 if blinds is None else _round3_blinded)
    t_labels = (L.T_1, L.T_2, L.T_3, L.T_4) if blinds is None \
        else (L.T_1, L.T_2, L.T_3, L.T_4, L.T_5)
    for k, lbl in enumerate(t_labels):
        comm[f"t_{k + 1}"] = t_comms[k]
        t.append_commitment(lbl, comm[f"t_{k + 1}"])
    zeta = t.challenge_scalar(L.ZETA)

    # ------------------------------------------------------ round 4
    zw = zeta * dom.omega % R_MOD
    ev = {}
    for wname, cname in (("a", "a"), ("b", "b"), ("c", "c"), ("d", "d")):
        ev[cname] = poly.evaluate(wire_coeffs[wname], zeta)
        if cname != "c":   # dusk opens only a, b, d (and z) at zeta*omega
            ev[cname + "_next"] = poly.evaluate(wire_coeffs[wname], zw)
    for j, nm in enumerate(("sigma1", "sigma2", "sigma3")):
        ev[nm] = poly.evaluate(pk.sigma_coeffs[j], zeta)
    for nm in ("q_arith", "q_c", "q_l", "q_r"):
        ev[nm] = poly.evaluate(pk.selector_coeffs[nm], zeta)
    ev["z_shifted"] = poly.evaluate(z_coeffs, zw)

    r_coeffs, r0_unused = build_linearization(
        pk, ev, zeta, beta, gamma, alpha, ch, z_coeffs)
    ev["r"] = poly.evaluate(r_coeffs, zeta)

    pi_at_zeta = eval_pi(composer.pi, dom, zeta)
    t_eval = compute_t_eval(ev, pi_at_zeta, zeta, beta, gamma, alpha, dom)
    # cross-check the linearization against the actual quotient
    zn = pow(zeta, n, R_MOD)
    t_flat = flatten_t(chunks, zn)
    assert poly.evaluate(t_flat, zeta) == t_eval, \
        "linearization/quotient mismatch (internal bug)"

    append_evals(t, ev, t_eval)
    v = t.challenge_scalar(L.AGGREGATE_WITNESS)
    if challenge_trace is not None:
        # parity hook (tests/test_parity_fixtures.py): expose the
        # squeezed challenges so dusk-exported challenges.json can pin
        # transcript labels + append order per round
        challenge_trace.update(beta=beta, gamma=gamma, alpha=alpha,
                               zeta=zeta, v=v)

    # ------------------------------------------------------ round 5
    agg_zeta_polys = [
        t_flat, r_coeffs,
        wire_coeffs["a"], wire_coeffs["b"], wire_coeffs["c"],
        wire_coeffs["d"],
        pk.sigma_coeffs[0], pk.sigma_coeffs[1], pk.sigma_coeffs[2],
        pk.selector_coeffs["q_arith"], pk.selector_coeffs["q_c"],
        pk.selector_coeffs["q_l"], pk.selector_coeffs["q_r"],
    ]
    agg_zw_polys = [z_coeffs, wire_coeffs["a"], wire_coeffs["b"],
                    wire_coeffs["d"]]
    comm["w_z"], comm["w_zw"] = _memo("r5", lambda: (
        kzg.open_aggregate(agg_zeta_polys, zeta, v, srs),
        kzg.open_aggregate(agg_zw_polys, zw, v, srs)))
    t.append_commitment(L.W_Z, comm["w_z"])
    t.append_commitment(L.W_Z_W, comm["w_zw"])

    evals = {k: ev[k] for k in
             ("a", "b", "c", "d", "a_next", "b_next", "d_next",
              "sigma1", "sigma2", "sigma3",
              "q_arith", "q_c", "q_l", "q_r", "z_shifted", "r")}
    return Proof(comm, evals)


# ---------------------------------------------------------------------------
# shared helpers (verifier uses the same code paths)
# ---------------------------------------------------------------------------


def perm_products(ev, zeta, beta, gamma):
    """(prod_id over 4 cols, prod_sigma over first 3 cols)."""
    w = (ev["a"], ev["b"], ev["c"], ev["d"])
    prod_id = 1
    for j in range(4):
        prod_id = prod_id * ((w[j] + beta * KS[j] * zeta + gamma) % R_MOD) \
            % R_MOD
    prod_sig3 = 1
    for j, nm in enumerate(("sigma1", "sigma2", "sigma3")):
        prod_sig3 = prod_sig3 * ((w[j] + beta * ev[nm] + gamma) % R_MOD) \
            % R_MOD
    return prod_id, prod_sig3


def linearization_coefficients(ev, zeta, beta, gamma, alpha, ch, dom):
    """Scalar coefficient per committed polynomial in r(X); shared by
    the prover (applied to coeff vectors) and the verifier (applied to
    commitments)."""
    w = (ev["a"], ev["b"], ev["c"], ev["d"])
    # no widget reads c at the next row (the logic product wire moved to
    # the current row), so c' is neither opened nor needed here
    wn = (ev["a_next"], ev["b_next"], 0, ev["d_next"])
    qa = ev["q_arith"]
    co = {}
    for name, scalar in C.arith_coeffs(w).items():
        co[name] = qa * scalar % R_MOD
    co["q_range"] = ch["range"] * C.range_scalar(w, wn, ch["range"]) % R_MOD
    co["q_logic"] = ch["logic"] * \
        C.logic_scalar(w, wn, ev["q_c"], ch["logic"]) % R_MOD
    co["q_fixed"] = ch["fixed"] * C.fixed_scalar(
        w, wn, ev["q_l"], ev["q_r"], ev["q_c"], ch["fixed"]) % R_MOD
    co["q_vgadd"] = ch["vgadd"] * C.vgadd_scalar(w, wn, ch["vgadd"]) % R_MOD

    prod_id, prod_sig3 = perm_products(ev, zeta, beta, gamma)
    l1_zeta = l1_eval(dom, zeta)
    co["z"] = (alpha * prod_id + alpha * alpha % R_MOD * l1_zeta) % R_MOD
    co["sigma4"] = (- alpha * prod_sig3 % R_MOD * beta % R_MOD
                    * ev["z_shifted"]) % R_MOD
    return co


def build_linearization(pk, ev, zeta, beta, gamma, alpha, ch, z_coeffs):
    co = linearization_coefficients(ev, zeta, beta, gamma, alpha, ch,
                                    pk.domain)
    r = []
    for name in ("q_m", "q_l", "q_r", "q_o", "q_4", "q_c",
                 "q_range", "q_logic", "q_fixed", "q_vgadd"):
        r = poly.add(r, poly.scale(pk.selector_coeffs[name], co[name]))
    r = poly.add(r, poly.scale(z_coeffs, co["z"]))
    r = poly.add(r, poly.scale(pk.sigma_coeffs[3], co["sigma4"]))
    return r, 0


def l1_eval(dom, x: int) -> int:
    """L1(x) = (x^n - 1) / (n (x - 1))."""
    zh = dom.vanishing_eval(x)
    if zh == 0:
        return 1 if x == 1 else 0
    return zh * dom.n_inv % R_MOD * pow((x - 1) % R_MOD, -1, R_MOD) % R_MOD


def eval_pi(pi_map: dict, dom, zeta: int) -> int:
    """PI(zeta) = sum pi_i L_i(zeta) (sparse)."""
    if not pi_map:
        return 0
    zh = dom.vanishing_eval(zeta)
    omegas = dom.elements()
    idxs = sorted(pi_map)
    denoms = fr.batch_inv([(zeta - omegas[i]) % R_MOD for i in idxs])
    acc = 0
    for k, i in enumerate(idxs):
        li = zh * dom.n_inv % R_MOD * omegas[i] % R_MOD * denoms[k] % R_MOD
        acc = (acc + pi_map[i] * li) % R_MOD
    return acc


def compute_t_eval(ev, pi_at_zeta, zeta, beta, gamma, alpha, dom) -> int:
    """t(zeta) from the opened evaluations (verifier-recomputable):
    t = (r + PI - alpha*prod_sig3*(d+gamma)*z_w - alpha^2 L1(zeta)) / Z_H."""
    _, prod_sig3 = perm_products(ev, zeta, beta, gamma)
    num = (ev["r"] + pi_at_zeta
           - alpha * prod_sig3 % R_MOD * ((ev["d"] + gamma) % R_MOD)
           % R_MOD * ev["z_shifted"]
           - alpha * alpha % R_MOD * l1_eval(dom, zeta)) % R_MOD
    return num * pow(dom.vanishing_eval(zeta), -1, R_MOD) % R_MOD


def flatten_t(chunks, zn: int):
    out = []
    zp = 1
    for ck in chunks:
        out = poly.add(out, poly.scale(ck, zp))
        zp = zp * zn % R_MOD
    return out


def append_evals(t: Transcript, ev: dict, t_eval: int) -> None:
    """Fixed evaluation append order (mirrored by the verifier)."""
    t.append_scalar(L.A_EVAL, ev["a"])
    t.append_scalar(L.B_EVAL, ev["b"])
    t.append_scalar(L.C_EVAL, ev["c"])
    t.append_scalar(L.D_EVAL, ev["d"])
    t.append_scalar(L.A_NEXT_EVAL, ev["a_next"])
    t.append_scalar(L.B_NEXT_EVAL, ev["b_next"])
    t.append_scalar(L.D_NEXT_EVAL, ev["d_next"])
    t.append_scalar(L.LEFT_SIG_EVAL, ev["sigma1"])
    t.append_scalar(L.RIGHT_SIG_EVAL, ev["sigma2"])
    t.append_scalar(L.OUT_SIG_EVAL, ev["sigma3"])
    t.append_scalar(L.Q_ARITH_EVAL, ev["q_arith"])
    t.append_scalar(L.Q_C_EVAL, ev["q_c"])
    t.append_scalar(L.Q_L_EVAL, ev["q_l"])
    t.append_scalar(L.Q_R_EVAL, ev["q_r"])
    t.append_scalar(L.PERM_EVAL, ev["z_shifted"])
    t.append_scalar(L.T_EVAL, t_eval)
    t.append_scalar(L.R_EVAL, ev["r"])


class Prover:
    """Convenience wrapper bundling composer+keys (dusk `Prover` shape)."""

    def __init__(self, label: bytes = L.PROTOCOL):
        from ..cs import Composer
        self.label = label
        self.composer = Composer()
        self.pk = None
        self.vk = None

    def preprocess(self, srs):
        from .preprocess import preprocess as _pp
        self.pk, self.vk = _pp(self.composer, srs)
        return self.vk

    def prove(self, srs, blinding_seed: bytes = None) -> Proof:
        if self.pk is None:
            self.preprocess(srs)
        return prove(self.composer, self.pk, srs, self.label,
                     blinding_seed=blinding_seed)
