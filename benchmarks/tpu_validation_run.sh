#!/usr/bin/env bash
# Unattended TPU validation sequence for polar_tpu.
#
# Runs the round's blocked-on-hardware checklist end to end, respecting the
# axon single-process rule and the post-exit session cooldown (see
# .claude/skills/verify/SKILL.md). Each step is an isolated process run
# under `timeout`, separated by a cooldown sleep; the relay is re-probed
# before every step so a mid-run outage aborts cleanly instead of silently
# writing CPU numbers.
#
#   bash benchmarks/tpu_validation_run.sh [probes|lane|bench|suite|bler|all]
#
# Logs: /tmp/tpu_validation/<step>.log ; summary lines to stdout.

set -u
PHASE="${1:-all}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
LOGDIR=/tmp/tpu_validation
mkdir -p "$LOGDIR"
COOLDOWN="${TPU_COOLDOWN_S:-150}"

relay_ok() {
    [ "$(curl -s -o /dev/null -w '%{http_code}' --max-time 5 \
         http://127.0.0.1:8083/)" != "000" ]
}

note() { echo "[$(date -u +%H:%M:%SZ)] $*"; }

# run_step <name> <timeout_s> <cmd...>: relay-gate, run, log, cooldown.
run_step() {
    local name="$1" tmo="$2"; shift 2
    if ! relay_ok; then
        note "SKIP $name: relay down"
        return 1
    fi
    note "START $name (timeout ${tmo}s)"
    ( cd "$REPO" && timeout "$tmo" "$@" ) >"$LOGDIR/$name.log" 2>&1
    local rc=$?
    note "END $name rc=$rc ($(tail -c 400 "$LOGDIR/$name.log" | tr '\n' ' ' \
         | tail -c 200))"
    note "cooldown ${COOLDOWN}s"
    sleep "$COOLDOWN"
    return $rc
}

phase_probes() {
    # Cold Mosaic compile times per bench-ladder config (CRITICAL RISK from
    # round-3 notes: the driver bench compiles cold; config #1 must fit its
    # budget) + the sc_n256/sc_n64 suite-crash repro (HTTP 500 at b=8/b=6
    # after the 2.2x spill-budget TB change).
    run_step probe_scl_traced_b9 1500 \
        python benchmarks/probe_kernel.py --kind scl --b 9 --traced 1 --cold 1 --run 1
    run_step probe_sc_b8_t1024 1200 \
        python benchmarks/probe_kernel.py --kind sc --b 8 --tile 1024 --cold 1 --run 1
    run_step probe_sc_b6_t4096 1200 \
        python benchmarks/probe_kernel.py --kind sc --b 6 --tile 4096 --cold 1 --run 1
    run_step probe_scl_fast_b9 1800 \
        python benchmarks/probe_kernel.py --kind scl --b 9 --fast 1 --cold 1 --run 1
    # raised scoped-VMEM limit: wider batch tiles per kernel invocation.
    # The kernel is per-op overhead-bound at TB=128 (~470 cycles/op), so
    # doubling the lanes per op is the single biggest perf lever to probe.
    run_step probe_scl_fast_b9_v32_t256 1800 \
        python benchmarks/probe_kernel.py --kind scl --b 9 --fast 1 --cold 1 \
        --run 1 --vmem_mib 32 --tile 256
    run_step probe_scl_fast_b9_v64_t512 1800 \
        python benchmarks/probe_kernel.py --kind scl --b 9 --fast 1 --cold 1 \
        --run 1 --vmem_mib 64 --tile 512
    grep -h '"ok"' "$LOGDIR"/probe_*.log 2>/dev/null || true
}

phase_lane() {
    # TPU compiled-kernel lane, chunked (one process each, cooldown between)
    export POLAR_TPU_TEST_TPU=1
    run_step lane_subtrees 1800 python -m pytest tests/test_tpu_compiled.py \
        -m tpu -q -k "subtree_compiled or sc_sweep"
    run_step lane_sweeps 2400 python -m pytest tests/test_tpu_compiled.py \
        -m tpu -q -k "scl_sweep or fast_scl_sweep"
    run_step lane_fused_bp 2400 python -m pytest tests/test_tpu_compiled.py \
        -m tpu -q -k "full_fused or (bp_pallas and not cold)"
    run_step lane_cold_gates 3600 python -m pytest tests/test_tpu_compiled.py \
        -m tpu -q -k "cold_compiles"
    unset POLAR_TPU_TEST_TPU
}

phase_bench() {
    run_step bench 1800 python bench.py
    grep -h '"metric"' "$LOGDIR/bench.log" 2>/dev/null || true
}

phase_suite() {
    # full throughput survey refresh (fast rows included); budget generous
    run_step suite 5400 python benchmarks/throughput_suite.py
    tail -n 20 "$LOGDIR/suite.log" 2>/dev/null || true
}

phase_bler() {
    # fast-SCL quality row at production statistics
    run_step bler_fast 5400 python benchmarks/bler_validation.py \
        --chains northstar_fast --mc_iter 400 --bs 4096
    tail -n 6 "$LOGDIR/bler_fast.log" 2>/dev/null || true
}

phase_tune() {
    # chain-level effect of raised scoped-VMEM (wider batch tiles): only
    # for configs whose kernel probe compiled+ran ok. BENCH_ALLOW_SLOW_
    # COMPILE is set because these are deliberate specialized compiles.
    for mib in 32 64; do
        if grep -q '"ok": true' "$LOGDIR/probe_scl_fast_b9_v${mib}"_*.log \
            2>/dev/null; then
            run_step bench_vmem${mib} 2400 \
                env BENCH_ALLOW_SLOW_COMPILE=1 \
                POLAR_TPU_VMEM_LIMIT_MIB=$mib python bench.py
        else
            note "SKIP bench_vmem${mib}: kernel probe did not pass"
        fi
    done
    grep -h '"metric"' "$LOGDIR"/bench_vmem*.log 2>/dev/null || true
}

if ! relay_ok; then
    note "relay 127.0.0.1:8083 is DOWN — nothing to do"
    exit 2
fi
note "relay UP — starting phase '$PHASE'"

case "$PHASE" in
    probes) phase_probes ;;
    lane)   phase_lane ;;
    bench)  phase_bench ;;
    suite)  phase_suite ;;
    bler)   phase_bler ;;
    tune)   phase_tune ;;
    all)    phase_probes; phase_lane; phase_bench; phase_suite; phase_bler
            phase_tune ;;
    *)      note "unknown phase '$PHASE'"; exit 1 ;;
esac
note "phase '$PHASE' complete — logs in $LOGDIR"
