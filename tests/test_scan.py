"""Scan-engine equivalence: the O(log^2 n)-program `lax.scan` sweeps
(scan_core.py) must be bit-identical to the unrolled-tree decoders."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from polar_tpu.models.polar.sc import PolarSCDecoder
from polar_tpu.models.polar.scl import PolarSCLDecoder
from polar_tpu.models.polar.construction import generate_5g_ranking


@pytest.mark.parametrize("mode", ["minsum", "exact"])
@pytest.mark.parametrize("n", [2, 16, 128])
def test_sc_scan_equals_unrolled(n, mode):
    k = n // 2
    frozen, _ = generate_5g_ranking(k, n, strict=False)
    rng = np.random.default_rng(n)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCDecoder(frozen, n, mode=mode,
                       schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCDecoder(frozen, n, mode=mode,
                       schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("list_size", [1, 4])
@pytest.mark.parametrize("n", [2, 16, 128])
def test_scl_scan_equals_unrolled(n, list_size):
    k = n // 2
    frozen, _ = generate_5g_ranking(k, n, strict=False)
    rng = np.random.default_rng(n + 1)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCLDecoder(frozen, n, list_size=list_size, use_fast_scl=False,
                        schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCLDecoder(frozen, n, list_size=list_size,
                        schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scl_scan_with_crc_matches_unrolled():
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    rng = np.random.default_rng(4)
    llr = rng.normal(0, 3, size=(16, n)).astype(np.float32)
    a = PolarSCLDecoder(frozen, n, list_size=4, crc_degree="CRC11",
                        use_fast_scl=False,
                        schedule="unrolled")(jnp.asarray(llr))
    b = PolarSCLDecoder(frozen, n, list_size=4, crc_degree="CRC11",
                        schedule="scan")(jnp.asarray(llr))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_auto_schedule_selection():
    frozen, _ = generate_5g_ranking(16, 32)
    assert PolarSCDecoder(frozen, 32).schedule == "unrolled"
    frozen1k, _ = generate_5g_ranking(512, 1024)
    assert PolarSCDecoder(frozen1k, 1024).schedule == "scan"
    assert PolarSCLDecoder(frozen1k, 1024).schedule == "scan"


@pytest.mark.parametrize("lower_stages", [1, 3, 5])
def test_hybrid_sweeps_equal_plain(lower_stages):
    from polar_tpu.models.polar.scan_core import (
        sc_sweep, sc_sweep_hybrid, scl_sweep, scl_sweep_hybrid)
    n, k = 64, 32
    frozen, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(7)
    llr = jnp.asarray(rng.normal(0, 3, (n, 16)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sc_sweep(llr, mask)),
        np.asarray(sc_sweep_hybrid(llr, mask, lower_stages=lower_stages)))
    ua, pa = scl_sweep(llr, mask, 4)
    ub, pb = scl_sweep_hybrid(llr, mask, 4, lower_stages=lower_stages)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-6)


def test_sc_pallas_equals_xla():
    from polar_tpu.models.polar.scan_core import sc_sweep, sc_sweep_hybrid
    n = 128
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(14)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sc_sweep(llr, mask)),
        np.asarray(sc_sweep_hybrid(llr, mask, use_pallas=True)))


@pytest.mark.parametrize("list_size", [4, 8])
def test_pallas_subtree_equals_xla(list_size):
    # interpret mode on CPU; the same kernel runs compiled on TPU and is
    # covered by bench.py / the CLI there
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 128
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(13)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, list_size)
    ub, pb = scl_sweep_hybrid(llr, mask, list_size, use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_static_subtree_equals_xla():
    """m = n/2^b <= 8 unrolls the outer sweep, which engages the
    code-specialized static-frozen kernel (frz_static) with
    liveness-pruned pointer composition; equality vs the plain engine
    proves both bit-identical."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(17)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 8)
    ub, pb = scl_sweep_hybrid(llr, mask, 8, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_traced_kernel_override_equals_xla(monkeypatch):
    """POLAR_TPU_TRACED_KERNEL=1 forces the generic (frz-in-SMEM) kernel
    on the unrolled outer — the cold-compile-cache bench ladder's leading
    config — and must stay bit-identical to the plain engine."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    monkeypatch.setenv("POLAR_TPU_TRACED_KERNEL", "1")
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(17)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 8)
    ub, pb = scl_sweep_hybrid(llr, mask, 8, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_cond_leaves_kernel_equals_xla(monkeypatch):
    """POLAR_TPU_COND_KERNEL=1 adds a runtime frozen-leaf skip (lax.cond
    on the SMEM frozen flag) to the traced kernel; both cond branches
    compute the branchless form's exact expressions, so the engine must
    stay bit-identical to the plain XLA sweep."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    monkeypatch.setenv("POLAR_TPU_TRACED_KERNEL", "1")
    monkeypatch.setenv("POLAR_TPU_COND_KERNEL", "1")
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(29)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 8)
    ub, pb = scl_sweep_hybrid(llr, mask, 8, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_pallas_blocked_subtree_equals_xla():
    """L=16 routes to the blocked kernel (lists of (8, TB) blocks); one
    tiny config keeps XLA-CPU's interpret-mode compile tolerable — the
    compiled kernel at L in {16, 32} is covered by the TPU lane."""
    from polar_tpu.models.polar.scan_core import scl_sweep, scl_sweep_hybrid
    n = 32
    frozen, _ = generate_5g_ranking(n // 2, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(23)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    ua, pa = scl_sweep(llr, mask, 16)
    ub, pb = scl_sweep_hybrid(llr, mask, 16, lower_stages=2,
                              use_pallas=True)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-5)


def test_leaf_schedule():
    from polar_tpu.models.polar.scan_core import leaf_schedule
    S, desc, rise = leaf_schedule(8)
    assert S == 3
    np.testing.assert_array_equal(desc, [3, 0, 1, 0, 2, 0, 1, 0])
    np.testing.assert_array_equal(rise, [0, 1, 0, 2, 0, 1, 0, 3])


# ----------------------------------------------------------------------
# fast-SCL (Hashemi rate-0 / repetition pruning) — scan_core's pruned
# hybrid sweep must be bit-identical to the unrolled engine's
# use_fast_scl=True path (the reference default)
# ----------------------------------------------------------------------

def test_fast_schedule_matches_unrolled_pruning_rules():
    """fast_schedule applies exactly the unrolled engine's rules (scl.py
    _node): topmost all-frozen node -> 'z', all-frozen-but-last-leaf ->
    'r', otherwise recurse; ops tile the leaf range in order."""
    from polar_tpu.models.polar.scan_core import fast_schedule
    mask = np.array([1, 1, 1, 1, 1, 1, 1, 0,   # rep node at stage 3
                     0, 1, 0, 0, 1, 1, 1, 1], dtype=bool)
    ops = fast_schedule(mask)
    assert ops[0] == ("r", 3, 0)
    assert ops[1] == ("i", 0, 8)
    assert ops[2] == ("f", 0, 9)
    assert ("z", 2, 12) in ops
    # ops cover the range exactly, in leaf order
    covered = [lo + q for kind, s, lo in ops for q in range(1 << s)]
    assert covered == list(range(16))


def _fast_vs_unrolled(mask, n, L, b, use_pallas, bs=16, mode="minsum"):
    from polar_tpu.models.polar.scan_core import scl_sweep_hybrid_fast
    frozen = np.where(mask)[0]
    rng = np.random.default_rng(n * 31 + L + b)
    llr_logits = rng.normal(0, 3, size=(bs, n)).astype(np.float32)
    ref = PolarSCLDecoder(frozen, n, list_size=L, mode=mode,
                          schedule="unrolled", use_fast_scl=True)
    u_ref = np.asarray(ref(jnp.asarray(llr_logits)))
    u_all, pm = scl_sweep_hybrid_fast(-jnp.asarray(llr_logits).T, mask, L,
                                      mode=mode, lower_stages=b,
                                      use_pallas=use_pallas)
    sel = np.asarray(pm).argmin(axis=0)
    info = np.setdiff1d(np.arange(n), frozen)
    u_fast = np.asarray(u_all)[info][:, sel, np.arange(bs)].T
    np.testing.assert_array_equal(u_ref.astype(np.int8),
                                  u_fast.astype(np.int8))


@pytest.mark.parametrize("b", [3, 4])
@pytest.mark.parametrize("mode", ["minsum", "exact"])
def test_fast_hybrid_equals_unrolled_fast(b, mode):
    n, k = 256, 100  # 5G ranking yields upper rate-0 nodes at b=3/4
    frozen, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _fast_vs_unrolled(mask, n, 8, b, use_pallas=False, mode=mode)


def test_fast_hybrid_upper_rep_node():
    """A frozen prefix ending in one info leaf spans several subtrees —
    the upper repetition fork's parent map must ride the first covered
    emission for survivor backtracking to stay consistent."""
    n = 64
    mask = np.zeros(n, bool)
    mask[:31] = True   # rep node at stage 5 == 4 subtrees at b=3
    mask[40] = True
    _fast_vs_unrolled(mask, n, 8, 3, use_pallas=False)


def test_fast_pallas_subtree_equals_unrolled_fast():
    """The sched_static Pallas kernel (interpret on CPU): rate-0 bulk pm
    updates and repetition forks inside the fused kernel."""
    n = 64
    frozen, _ = generate_5g_ranking(32, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _fast_vs_unrolled(mask, n, 8, 3, use_pallas=True, bs=128)


@pytest.mark.skipif(
    os.environ.get("POLAR_TPU_TEST_CPUSLOW") != "1"
    and os.environ.get("POLAR_TPU_TEST_TPU") != "1",
    reason="blocked-kernel interpret mode costs ~6 min on XLA-CPU "
           "(POLAR_TPU_TEST_CPUSLOW=1 opts in); the compiled equivalent "
           "runs in the TPU lane (test_tpu_compiled.py::"
           "test_fast_scl_sweep_pallas_equals_xla[16])")
def test_fast_pallas_blocked_subtree_equals_unrolled_fast():
    n = 64
    frozen, _ = generate_5g_ranking(32, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _fast_vs_unrolled(mask, n, 16, 3, use_pallas=True, bs=128)


def test_sc_rate0_pruned_kernel_equals_plain():
    """The SC whole-tree kernel's rate-0-pruned schedule (rep=False) must
    be bit-identical to the plain traced sweep — an all-frozen span's
    partial sums are zero regardless of its LLRs."""
    from polar_tpu.models.polar.scan_core import fast_schedule, sc_sweep
    from polar_tpu.models.polar.pallas_scl import sc_subtree_pallas
    from polar_tpu.ops.butterfly import polar_transform
    n, k = 256, 100
    frozen, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    rng = np.random.default_rng(41)
    llr = jnp.asarray(rng.normal(0, 3, (n, 128)), jnp.float32)
    sched = tuple(fast_schedule(mask, rep=False))
    assert any(op[0] == "z" for op in sched)
    cw = sc_subtree_pallas(llr, None, b=8, llr_max=30.0, mode="minsum",
                           interpret=True, sched_static=sched)
    u = np.asarray(polar_transform(cw.astype(jnp.int8), axis=0))
    np.testing.assert_array_equal(u, np.asarray(sc_sweep(llr, mask)))


def test_scl_decoder_fast_scan_routes_to_pruned_sweep():
    """PolarSCLDecoder(schedule='scan', use_fast_scl=True) must equal the
    unrolled fast engine end-to-end (decoder-level wiring)."""
    n, k, L = 256, 128, 8
    frozen, _ = generate_5g_ranking(k, n)
    rng = np.random.default_rng(99)
    llr = jnp.asarray(rng.normal(0, 3, size=(16, n)), jnp.float32)
    a = PolarSCLDecoder(frozen, n, list_size=L, schedule="unrolled",
                        use_fast_scl=True)(llr)
    b = PolarSCLDecoder(frozen, n, list_size=L, schedule="scan",
                        use_fast_scl=True)(llr)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fast_hybrid_random_masks_equal_unrolled():
    """Property sweep: random frozen sets at varying rates plus adversarial
    patterns (whole-tree repetition node, all-info) — the pruned hybrid
    sweep must stay bit-identical to the unrolled fast engine for ANY
    mask, not just 5G-ranked ones."""
    n = 64
    rng = np.random.default_rng(7)
    masks = []
    for _ in range(6):
        mask = rng.random(n) < rng.uniform(0.15, 0.85)
        if mask.all():
            mask[int(rng.integers(n))] = False
        masks.append(mask)
    whole_tree_rep = np.ones(n, bool)
    whole_tree_rep[-1] = False           # 'r' node at the root stage
    masks.append(whole_tree_rep)
    masks.append(np.zeros(n, bool))      # all-info: nothing to prune
    for i, mask in enumerate(masks):
        _fast_vs_unrolled(mask, n, 4, 3, use_pallas=False, bs=8)
    # two of them through the fused kernel (interpret mode) as well
    _fast_vs_unrolled(masks[0], n, 8, 3, use_pallas=True, bs=128)
    _fast_vs_unrolled(whole_tree_rep, n, 8, 3, use_pallas=True, bs=128)


def test_env_override_reaches_whole_tree_in_fast_path(monkeypatch):
    """ADVICE r4 (medium): POLAR_TPU_LOWER_STAGES=S must engage the
    whole-tree depth in the FAST sweep (clamp to S, not S-1) — the env is
    the only depth-pinning mechanism bench.py/profile_chain.py use. The
    plain hybrid keeps its S-1 clamp (carry layout assumes top >= 1)."""
    from polar_tpu.models.polar import scan_core
    monkeypatch.setenv("POLAR_TPU_LOWER_STAGES", "10")
    assert scan_core.resolve_fast_lower_stages(10, 8192, True, 8) == 10
    assert scan_core.resolve_lower_stages(10, 8192, True, L=8) == 9
    monkeypatch.setenv("POLAR_TPU_LOWER_STAGES", "99")  # clamps to S
    assert scan_core.resolve_fast_lower_stages(10, 8192, True, 8) == 10
    # explicit argument beats the env and also clamps to S
    assert scan_core.resolve_fast_lower_stages(10, 8192, True, 8,
                                               lower_stages=11) == 10


def test_fast_whole_tree_kernel_equals_unrolled():
    """lower_stages = S (whole-tree kernel, m=1, no upper stages — the
    round-4 bench leader config) must stay bit-identical to the unrolled
    fast engine."""
    n = 32
    frozen, _ = generate_5g_ranking(16, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _fast_vs_unrolled(mask, n, 8, 5, use_pallas=True, bs=64)
    _fast_vs_unrolled(mask, n, 8, 5, use_pallas=False, bs=64)


# ----------------------------------------------------------------------
# fast_rate1: rate-1 ('o') node shortcuts (Hashemi fast-SSCL, beyond the
# reference's rate-0/rep set) — all fast engines must stay bit-identical
# to the unrolled engine with fast_rate1=True
# ----------------------------------------------------------------------

def _rate1_vs_unrolled(mask, n, L, b, use_pallas, bs=16, mode="minsum",
                       seed=0):
    from polar_tpu.models.polar.scan_core import scl_sweep_hybrid_fast
    frozen = np.where(mask)[0]
    rng = np.random.default_rng(seed + n * 31 + L + b)
    llr_logits = rng.normal(0, 3, size=(bs, n)).astype(np.float32)
    ref = PolarSCLDecoder(frozen, n, list_size=L, mode=mode,
                          schedule="unrolled", use_fast_scl=True,
                          fast_rate1=True)
    u_ref = np.asarray(ref(jnp.asarray(llr_logits)))
    u_all, pm = scl_sweep_hybrid_fast(-jnp.asarray(llr_logits).T, mask, L,
                                      mode=mode, lower_stages=b,
                                      use_pallas=use_pallas, rate1=True)
    sel = np.asarray(pm).argmin(axis=0)
    info = np.setdiff1d(np.arange(n), frozen)
    u_fast = np.asarray(u_all)[info][:, sel, np.arange(bs)].T
    np.testing.assert_array_equal(u_ref.astype(np.int8),
                                  u_fast.astype(np.int8))


def test_rate1_schedule_rules():
    """fast_schedule(rate1=True) emits 'o' for maximal all-info nodes and
    leaves the rate-0/rep rules untouched; rate1=False is unchanged."""
    from polar_tpu.models.polar.scan_core import fast_schedule
    mask = np.array([1, 1, 1, 1, 1, 1, 1, 0,    # rep node at stage 3
                     0, 0, 0, 0, 1, 0, 0, 0], dtype=bool)
    ops = fast_schedule(mask, rate1=True)
    assert ops[0] == ("r", 3, 0)
    assert ("o", 2, 8) in ops                    # maximal all-info span
    assert ("r", 1, 12) in ops
    assert ("o", 1, 14) in ops
    assert not any(k == "o" for k, _, _ in fast_schedule(mask))
    # ops tile the leaf range exactly, in order
    covered = [lo + q for k, s, lo in ops for q in range(1 << s)]
    assert covered == list(range(16))


@pytest.mark.parametrize("mode", ["minsum", "exact"])
def test_rate1_hybrid_equals_unrolled(mode):
    n, k = 256, 160  # high rate: rich mix of 'o' spans at b=3
    frozen, _ = generate_5g_ranking(k, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _rate1_vs_unrolled(mask, n, 8, 3, use_pallas=False, mode=mode)


def test_rate1_upper_nodes_equal_unrolled():
    """Rate-1 nodes spanning whole subtrees run at their TRUE stage in the
    outer sweep (theta forks composing the live upper pointers) and emit
    stage-b codeword chunks via the upper butterfly — the case where the
    broadcast shortcut of the upper rep fork would be wrong."""
    n = 64
    mask = np.zeros(n, bool)
    mask[:8] = True                  # 'o' at stages 3 (sub), 4 and 5 (upper)
    _rate1_vs_unrolled(mask, n, 8, 3, use_pallas=False)
    _rate1_vs_unrolled(mask, n, 8, 3, use_pallas=True, bs=128)
    mask_all_info = np.zeros(n, bool)   # single whole-tree 'o'
    _rate1_vs_unrolled(mask_all_info, n, 4, 3, use_pallas=False, bs=8)


def test_rate1_pallas_subtree_equals_unrolled():
    """'o' ops inside the fused kernel (interpret on CPU): in-kernel
    iterative-min reliability extraction + theta flip forks."""
    n = 64
    frozen, _ = generate_5g_ranking(32, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _rate1_vs_unrolled(mask, n, 8, 3, use_pallas=True, bs=128)


def test_rate1_random_masks_equal_unrolled():
    """Property sweep over random frozen sets (any mask, not just 5G)."""
    n = 64
    rng = np.random.default_rng(11)
    for i in range(6):
        mask = rng.random(n) < rng.uniform(0.15, 0.85)
        if mask.all():
            mask[int(rng.integers(n))] = False
        _rate1_vs_unrolled(mask, n, 4, 3, use_pallas=False, bs=8, seed=i)


@pytest.mark.skipif(
    os.environ.get("POLAR_TPU_TEST_CPUSLOW") != "1"
    and os.environ.get("POLAR_TPU_TEST_TPU") != "1",
    reason="blocked-kernel interpret mode is minutes-slow on XLA-CPU "
           "(POLAR_TPU_TEST_CPUSLOW=1 opts in); the compiled equivalent "
           "runs in the TPU lane")
def test_rate1_blocked_subtree_equals_unrolled():
    n = 64
    frozen, _ = generate_5g_ranking(32, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _rate1_vs_unrolled(mask, n, 16, 3, use_pallas=True, bs=128)


def test_rate1_decoder_wiring_and_bler_sanity():
    """PolarSCLDecoder(fast_rate1=True) routes both schedules to the rate-1
    contract, and its block-error rate stays within Monte-Carlo noise of
    the established fast-SCL engine (the Hashemi flip set is lossless)."""
    n, k, L = 64, 32, 8
    frozen, _ = generate_5g_ranking(k, n)
    rng = np.random.default_rng(123)
    bs = 512
    u = rng.integers(0, 2, size=(bs, k)).astype(np.float32)
    from polar_tpu.models.polar.encode import PolarEncoder
    enc = PolarEncoder(frozen, n)
    x = np.asarray(enc(jnp.asarray(u)))
    snr = 2.0
    sigma2 = 1.0 / (2 * (k / n) * 10 ** (snr / 10))
    llr_scale = 2.0 / sigma2
    y = (1 - 2 * x) + rng.normal(0, np.sqrt(sigma2), size=x.shape)
    llr_logits = (-llr_scale * y).astype(np.float32)
    dec_fast = PolarSCLDecoder(frozen, n, list_size=L, schedule="scan",
                               use_fast_scl=True)
    dec_r1u = PolarSCLDecoder(frozen, n, list_size=L, schedule="unrolled",
                              use_fast_scl=True, fast_rate1=True)
    dec_r1s = PolarSCLDecoder(frozen, n, list_size=L, schedule="scan",
                              use_fast_scl=True, fast_rate1=True)
    u_r1u = np.asarray(dec_r1u(jnp.asarray(llr_logits)))
    u_r1s = np.asarray(dec_r1s(jnp.asarray(llr_logits)))
    np.testing.assert_array_equal(u_r1u, u_r1s)   # cross-engine identity
    u_fast = np.asarray(dec_fast(jnp.asarray(llr_logits)))
    bler_fast = float(np.mean((u_fast != u).any(axis=1)))
    bler_r1 = float(np.mean((u_r1u != u).any(axis=1)))
    assert abs(bler_r1 - bler_fast) < 0.05, (bler_r1, bler_fast)


# ----------------------------------------------------------------------
# fast_rate1 SPC ('s') node shortcuts (Hashemi fast-SSCL-SPC)
# ----------------------------------------------------------------------

def test_spc_schedule_rules():
    """'s' ops form only for [frozen, info...] spans of width >= the SPC
    threshold (shipped OFF — measured slower than the r/o decomposition
    on the vector kernels; POLAR_TPU_SPC_MIN_STAGE enables)."""
    from polar_tpu.models.polar.scan_core import fast_schedule
    n = 64
    mask = np.zeros(n, bool)
    mask[:16] = True
    mask[16] = True
    ops = fast_schedule(mask, rate1=True, spc_min_stage=4)
    assert ops == [("z", 4, 0), ("s", 4, 16), ("o", 5, 32)]
    # default threshold: SPC off, the span decomposes
    assert not any(k == "s" for k, _, _ in fast_schedule(mask, rate1=True))
    # span-8 SPC pattern stays decomposed (r + o children)
    mask8 = np.zeros(16, bool)
    mask8[8] = True
    ops8 = fast_schedule(mask8, rate1=True, spc_min_stage=4)
    assert not any(k == "s" for k, _, _ in ops8)
    assert ("r", 1, 8) in ops8 and ("o", 1, 10) in ops8


def test_spc_nodes_equal_unrolled(monkeypatch):
    """SPC at every placement: whole-tree root (upper), spanning two
    subtrees (upper), at the kernel boundary, and inside a subtree —
    all bit-identical to the unrolled engine."""
    monkeypatch.setenv("POLAR_TPU_SPC_MIN_STAGE", "4")
    n = 64
    maskA = np.zeros(n, bool)
    maskA[0] = True                      # 's' at the root stage
    _rate1_vs_unrolled(maskA, n, 8, 3, use_pallas=False)
    maskB = np.zeros(n, bool)
    maskB[:16] = True
    maskB[16] = True                     # z(16) + s(16) + o(32)
    _rate1_vs_unrolled(maskB, n, 8, 3, use_pallas=False)   # upper 's'
    _rate1_vs_unrolled(maskB, n, 8, 5, use_pallas=False, mode="exact")
    _rate1_vs_unrolled(maskB, n, 4, 4, use_pallas=False, bs=8)


def test_spc_pallas_subtree_equals_unrolled(monkeypatch):
    """'s' ops inside the fused kernel (interpret on CPU), at the
    boundary (s == b) and with descent (s < b)."""
    monkeypatch.setenv("POLAR_TPU_SPC_MIN_STAGE", "4")
    n = 64
    maskB = np.zeros(n, bool)
    maskB[:16] = True
    maskB[16] = True
    _rate1_vs_unrolled(maskB, n, 8, 4, use_pallas=True, bs=128)
    _rate1_vs_unrolled(maskB, n, 8, 5, use_pallas=True, bs=128)


def test_rate1_spc_high_rate_bler_matches_fast(monkeypatch):
    """High-rate code where o-spans and SPC-16/32/64 all engage: the
    extended node set is lossless — BLER must match the established
    fast-SCL engine within Monte-Carlo noise."""
    monkeypatch.setenv("POLAR_TPU_SPC_MIN_STAGE", "4")
    n, k, L = 256, 200, 8
    frozen, _ = generate_5g_ranking(k, n)
    from polar_tpu.models.polar.scan_core import fast_schedule
    mask = np.zeros(n, bool)
    mask[frozen] = True
    kinds = {op[0] for op in fast_schedule(mask, rate1=True)}
    assert "s" in kinds and "o" in kinds
    rng = np.random.default_rng(42)
    bs = 512
    u = rng.integers(0, 2, size=(bs, k)).astype(np.float32)
    from polar_tpu.models.polar.encode import PolarEncoder
    x = np.asarray(PolarEncoder(frozen, n)(jnp.asarray(u)))
    snr = 4.0
    sigma2 = 1.0 / (2 * (k / n) * 10 ** (snr / 10))
    y = (1 - 2 * x) + rng.normal(0, np.sqrt(sigma2), size=x.shape)
    llr_logits = (-(2.0 / sigma2) * y).astype(np.float32)
    d_fast = PolarSCLDecoder(frozen, n, list_size=L, schedule="scan",
                             use_fast_scl=True)
    d_r1 = PolarSCLDecoder(frozen, n, list_size=L, schedule="scan",
                           use_fast_scl=True, fast_rate1=True)
    u_f = np.asarray(d_fast(jnp.asarray(llr_logits)))
    u_r = np.asarray(d_r1(jnp.asarray(llr_logits)))
    bler_f = float(np.mean((u_f != u).any(axis=1)))
    bler_r = float(np.mean((u_r != u).any(axis=1)))
    assert abs(bler_r - bler_f) < 0.02, (bler_r, bler_f)


def test_bitonic_topl_kernel_equals_unrolled(monkeypatch):
    """POLAR_TPU_BITONIC_TOPL=1 swaps the kernel's iterative top-L for a
    bitonic sorting network with an explicit index tie-break — a strict
    total order, so the output is bit-identical to lax.top_k. Covers
    leaf, repetition and rate-1 forks through the fused kernel."""
    monkeypatch.setenv("POLAR_TPU_BITONIC_TOPL", "1")
    n = 64
    frozen, _ = generate_5g_ranking(32, n)
    mask = np.zeros(n, bool)
    mask[frozen] = True
    _fast_vs_unrolled(mask, n, 8, 3, use_pallas=True, bs=128)
    _rate1_vs_unrolled(mask, n, 8, 3, use_pallas=True, bs=128)
