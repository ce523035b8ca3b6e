"""Benchmark: planner/learner throughput per chip vs the reference.

Headline (BASELINE.md configs 2/4): MCTS/UCT planning at 4096 parallel trees,
env-steps/s per chip. The numerator runs the fused array-encoded MCTS on the
functional CartPole env on the default JAX device (the TPU chip under the
driver). The denominator runs the reference's pure-Python object-tree MCTS
planner on gymnasium's numpy CartPole — the reference's natural, dispatch-free
substrate — with the identical budget/episodes/horizon/temperature, so the
ratio measures planner architecture, not substrate overhead
(reference: rl_agents/agents/tree_search/mcts.py:116-200).

Timing methodology: on the tunneled axon device, ``jax.block_until_ready``
returns at enqueue time, NOT completion — naive timings overstate throughput
by orders of magnitude (round-1 numbers had this flaw). Every device metric
here is therefore measured as the SLOPE of wall time over a chained
``lax.scan`` of data-dependent repetitions with a forced scalar host
transfer: t(reps=R) - t(reps=1) over R-1 executions cancels both the RTT
and the transfer cost, leaving pure device compute.

Roofline accounting: every timed program's FLOP and HBM-byte counts come
from XLA's own cost analysis of the compiled executable
(``compiled.cost_analysis()``), so achieved FLOP/s and bytes/s are reported
per metric, plus MFU against the chip's bf16 peak for the matmul-heavy
paths (the planners are gather-bound; for those bytes/expansion is the
meaningful roofline number). The programs run f32, so MFU vs the bf16 peak
is a lower bound on utilization.

Extra metrics reported in the same JSON line:
  - mcts_highway_steps_per_sec: 4096-tree MCTS on the functional highway env
  - opd_expansions_per_sec: 4096-tree OPD expansions/s (highway)
  - gbop_highway_expansions_per_sec: 4096-tree GBOP-D (obs-hash aggregation)
  - dqn_env_steps_per_sec: fused actor-learner (128 envs, one SGD update per
    env-step batch, matching the reference's target_update=1 recipe)
  - dqn_ego_attention_env_steps_per_sec: the flagship EgoAttentionNetwork
    fused learner at the reference RL recipe (latency-bound by design)
  - ego_attention_train_sgd_samples_per_sec: the same learner in
    THROUGHPUT mode (bf16, batch 4096 x 8 SGD updates per env batch) with
    MFU vs the bf16 peak
  - trailblazer_batched_plans_per_sec: 512 lockstep host-orchestrated
    TrailBlazer instances at a fixed oracle budget (dispatches/plan +
    amortization vs a lone instance)
  - drop_intersection_expansions_per_sec: robust-ensemble OPD (DROP) over a
    3-model IDM ensemble on the intersection surrogate (BASELINE config 5a)
  - bftq_fit_states_per_sec: a BFTQ fit epoch — budgeted Bellman targets
    (S x 10-budget forward + vmapped Pareto hulls + mixtures) + regression
    (BASELINE config 5b)
  - ego_attention_serving_fwd_per_sec: serving-batch bf16 forward (pure MXU)
``extra_vs_baseline`` carries measured reference denominators, each the
reference implementation on its natural substrate (python planners on
gymnasium CartPole or on the repo's CPU-jitted functional surrogates via
the handle layer; torch learners on CPU) — covering OPD, fused DQN, MCTS
highway, GBOP-D, stochastic GBOP, DROP, BFTQ and the EgoAttention learner.

A successful device run persists its JSON to ``BENCH_last_device.json``;
when the accelerator tunnel is dead the CPU-fallback line attaches that
artifact as ``last_device_run`` so a dead tunnel never erases the perf
record.

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

# keep a CPU backend available for the reference-baseline measurement even
# when the driver pins JAX_PLATFORMS to the TPU platform
if os.environ.get("BENCH_FORCE_CPU"):
    # pin the env var too: importing rl_agents_tpu re-applies JAX_PLATFORMS
    # (its __init__ restores env-var semantics over the axon sitecustomize),
    # which would otherwise re-enable the dead accelerator mid-bench
    os.environ["JAX_PLATFORMS"] = "cpu"
elif os.environ.get("JAX_PLATFORMS") and "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import jax
import jax.numpy as jnp

# persistent compile cache: remote (tunnel) compiles cost 30-120s each; cache
# hits make repeated bench runs cheap where the backend supports it
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

if os.environ.get("BENCH_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

_LAST_DEVICE_PATH = Path(__file__).parent / "BENCH_last_device.json"


def _probe_device_or_fall_back(attempts=3, window_s=120.0):
    """The tunneled axon device can hang indefinitely (dead tunnel); a hung
    bench emits no JSON at all. Probe the default device with a trivial
    program in a daemon thread, retrying ``attempts`` windows of ``window_s``
    (the tunnel sometimes comes up late); if it never answers, re-exec this
    script pinned to CPU so the driver still gets one honest (and
    so-labeled) JSON line."""
    import threading

    if os.environ.get("BENCH_FORCE_CPU"):
        return
    done = threading.Event()

    def probe():
        # backend init happens here too — it can hang just like compute
        float(jax.jit(lambda x: x + 1.0)(jnp.float32(0)))
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    for attempt in range(1, attempts + 1):
        if done.wait(window_s):
            return
        _log(f"device probe: no answer after window {attempt}/{attempts} "
             f"({window_s:.0f}s each)")
    _log(f"device probe timed out after {attempts}x{window_s:.0f}s; re-exec on CPU")
    env = dict(os.environ, BENCH_FORCE_CPU="1")
    os.execve(sys.executable,
              [sys.executable, os.path.abspath(__file__), *sys.argv[1:]], env)


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


_T0 = time.time()

EPISODES, HORIZON = 23, 8  # OLOP allocation of budget 184 at gamma 0.95
GAMMA, TEMPERATURE = 0.95, 40.0
# the CPU fallback measures the same per-tree program at a smaller batch so
# the whole bench still finishes; the JSON line carries the actual tree count
_CPU_FALLBACK = bool(os.environ.get("BENCH_FORCE_CPU"))
B = 512 if _CPU_FALLBACK else 4096
REPS = 4 if _CPU_FALLBACK else 8
_REPEATS = 3 if _CPU_FALLBACK else 5

# bf16 peak FLOP/s per chip by device kind (public spec sheets). The bench
# programs run f32, so MFU vs these peaks is a lower bound.
_PEAK_BF16 = {
    "v2": 45e12, "v3": 123e12, "v4": 275e12,
    "v5 lite": 197e12, "v5e": 197e12, "v5p": 459e12,
    "v6 lite": 918e12, "v6e": 918e12,
}


def _peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in sorted(_PEAK_BF16.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return peak
    return None


def _wall_median(run, repeats=_REPEATS):
    run()  # warm (compile)
    times = []
    for _ in range(repeats):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    return statistics.median(times)


_RTT = None


def _tunnel_rtt():
    """Wall cost of dispatching a trivial program and transferring its scalar
    result — the constant overhead every timed call pays. Measured once."""
    global _RTT
    if _RTT is None:
        @jax.jit
        def nop(x):
            return x + 1.0
        _RTT = _wall_median(lambda: float(nop(jnp.float32(0))))
    return _RTT


def _cost(compiled):
    """XLA's FLOP / HBM-byte estimate of a compiled executable."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # pragma: no cover - backend without cost analysis
        _log(f"cost_analysis unavailable: {e}")
        return None, None


def _roofline(flops_per_op, bytes_per_op, ops_per_sec, work_per_op, mfu=False):
    """Per-metric roofline fields: XLA-counted FLOPs/bytes per unit of work
    (env step / expansion), achieved FLOP/s and HBM bytes/s at the measured
    rate, and MFU vs the chip's bf16 peak for matmul-heavy paths."""
    if flops_per_op is None:
        return None
    out = {
        "flops_per_unit": round(flops_per_op / work_per_op, 1),
        "hbm_bytes_per_unit": round(bytes_per_op / work_per_op, 1),
        "achieved_flops_per_sec": round(flops_per_op * ops_per_sec),
        "achieved_hbm_bytes_per_sec": round(bytes_per_op * ops_per_sec),
    }
    peak = _peak_flops()
    if mfu:
        out["mfu_vs_bf16_peak"] = (round(flops_per_op * ops_per_sec / peak, 5)
                                   if peak else None)
    return out


def chained_seconds_per_op(make_step, reps=None):
    """True device seconds per op: wall time of ``reps`` chained
    (data-dependent) repetitions in one program, minus the measured
    dispatch/transfer RTT, divided by reps. ``make_step(carry) -> scalar``
    must make each repetition depend on the previous one so the device
    cannot overlap them. Pass a larger ``reps`` for ops so fast that REPS
    executions sit inside the RTT measurement noise.

    Returns ``(seconds_per_op, flops_per_op, bytes_per_op)`` with the FLOP /
    byte counts taken from XLA's cost analysis of the timed executable."""
    reps = reps or REPS

    @jax.jit
    def many():
        def step(c, _):
            return make_step(c), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return c

    compiled = many.lower().compile()
    flops, bytes_ = _cost(compiled)
    tr = _wall_median(lambda: float(many()))
    dt = max((tr - _tunnel_rtt()) / reps, 1e-9)
    return (dt,
            flops / reps if flops is not None else None,
            bytes_ / reps if bytes_ is not None else None)


def bench_mcts(env, num_actions):
    from rl_agents_tpu.agents.tree_search.mcts import mcts_plan_batch

    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)
    probs = jnp.ones(num_actions) / num_actions

    def step(c):
        ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, c.astype(jnp.int32))
        a, _, _ = mcts_plan_batch(env, params, states0, ks, probs, probs,
                                  num_actions, EPISODES, HORIZON, GAMMA, TEMPERATURE)
        return jnp.sum(a).astype(jnp.float32) * 1e-9

    # post one-hot, a plan-batch is ~1.5 ms — chain enough reps that the
    # total device time dwarfs tunnel-RTT noise (run-to-run swings of ~40%
    # were measured at the default chain length)
    dt, flops, bytes_ = chained_seconds_per_op(step, reps=REPS if _CPU_FALLBACK else 64)
    env_steps = B * EPISODES * HORIZON
    return env_steps / dt, _roofline(flops, bytes_, 1.0 / dt, env_steps)


def bench_mcts_cartpole():
    """Fused MCTS, 4096 trees, functional CartPole → env-steps/s."""
    from rl_agents_tpu.envs.cartpole import CartPoleEnv

    return bench_mcts(CartPoleEnv(max_episode_steps=200), 2)


def bench_mcts_highway():
    from rl_agents_tpu.envs.highway import HighwayEnv

    value, roof = bench_mcts(HighwayEnv(vehicles=15, lanes=4,
                                        max_episode_steps=40), 5)
    return value, roof


def bench_opd_highway(expansions=46):
    """4096-tree OPD on highway → node expansions/s (budget 230 / 5 actions).
    Gather-bound: the roofline number that matters is bytes/expansion."""
    from rl_agents_tpu.agents.tree_search.deterministic import opd_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def step(c):
        ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, c.astype(jnp.int32))
        a, _, _ = opd_plan_batch(env, params, states0, ks, num_actions=5,
                                 expansions=expansions, gamma=GAMMA,
                                 plan_capacity=8)
        return jnp.sum(a).astype(jnp.float32) * 1e-9

    dt, flops, bytes_ = chained_seconds_per_op(step, reps=REPS if _CPU_FALLBACK else 32)
    n_exp = B * expansions
    return n_exp / dt, _roofline(flops, bytes_, 1.0 / dt, n_exp)


def bench_gbop_highway(expansions=12):
    """Graph-based planner (GBOP-D) at 4096 trees on highway — obs-hash
    aggregation under load (VERDICT r2 item 6: one graph planner in bench
    extras). Runs the vmapped per-tree program (batch-major arenas)."""
    from rl_agents_tpu.agents.tree_search.batch import gbop_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    # full-size forest since the r4 kernel restructure (one-hot permutation
    # observe, fused two-bound VI sweeps, single arena write per expansion
    # round — docs/onehot.md "graph planners" section)
    Bg = B
    keys = jax.random.split(jax.random.PRNGKey(2), Bg)
    states0, obs0 = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    reps = 2 if _CPU_FALLBACK else 8

    @jax.jit
    def many():
        def step(c, _):
            ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(
                keys, c.astype(jnp.int32))
            a, _, _ = gbop_plan_batch(env, params, states0, obs0, ks,
                                      num_actions=5, expansions=expansions,
                                      gamma=GAMMA, accuracy=1e-2)
            return jnp.sum(a).astype(jnp.float32) * 1e-9, None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=reps)
        return c

    flops, bytes_ = _cost(many.lower().compile())
    tr = _wall_median(lambda: float(many()))
    dt = max((tr - _tunnel_rtt()) / reps, 1e-9)
    n_exp = Bg * expansions
    return n_exp / dt, _roofline(flops / reps if flops else None,
                                 bytes_ / reps if bytes_ else None, 1.0 / dt, n_exp)


def bench_gbop_stochastic_highway(episodes=8, horizon=4):
    """Stochastic GBOP (KL confidence sets + constrained max-expectation
    backups) at 512 trees on highway — the heaviest per-sample planner math
    in the library (reference: graph_based_stochastic.py:15-361); reported
    as oracle sample-steps/s."""
    from rl_agents_tpu.agents.tree_search.batch import gbop_stochastic_plan_batch
    from rl_agents_tpu.envs.highway import HighwayEnv

    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    params = env.default_params()
    Bg = min(B, 512)
    keys = jax.random.split(jax.random.PRNGKey(3), Bg)
    states0, obs0 = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def step(c):
        ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, c.astype(jnp.int32))
        a, _ = gbop_stochastic_plan_batch(
            env, params, states0, obs0, ks, num_actions=5, episodes=episodes,
            horizon=horizon, gamma=GAMMA, accuracy=1e-2,
            reward_threshold_coeff=2.0, transition_threshold_coeff=2.0)
        return jnp.sum(a).astype(jnp.float32) * 1e-9

    # the r5 W=1 fast path made a plan-batch ~1 ms — chain enough reps that
    # the segment dwarfs tunnel-RTT jitter (reps=2 swung 4x run-to-run)
    dt, flops, bytes_ = chained_seconds_per_op(step, reps=2 if _CPU_FALLBACK
                                               else 48)
    n = Bg * episodes * horizon
    return n / dt, _roofline(flops, bytes_, 1.0 / dt, n)


def _bench_fused(env, model, num_envs, steps, slope_factor=0, **kwargs):
    """Shared fused actor-learner timing: env-steps/s + roofline.

    With ``slope_factor`` K > 1, the rate is the SLOPE between a ``steps``
    segment and a ``K*steps`` segment — (t_long - t_short) / ((K-1)*steps)
    cancels the tunnel RTT, the state-copy cost AND any per-segment fixed
    cost, pinning latency-bound recipe metrics that a single-segment wall
    leaves in a +/-30% jitter band (VERDICT r4 item 6)."""
    import optax

    from rl_agents_tpu.parallel.actor_learner import make_actor_learner

    init_fn, segment_fn = make_actor_learner(env, model, optax.adam(5e-4),
                                             num_envs=num_envs, **kwargs)
    state0 = init_fn(jax.random.PRNGKey(0))
    flops, bytes_ = _cost(segment_fn.lower(state0, steps=steps).compile())
    # warm segment: fills the replay ring past learning_starts so EVERY timed
    # step runs its SGD updates (timing from a cold buffer under-trains the
    # first steps and over-credits the SGD-samples rate)
    state_warm, _ = segment_fn(jax.tree.map(jnp.copy, state0), steps=steps)

    def go(n=steps):
        # segment_fn donates its input buffers; hand it a fresh copy per run
        # (on CPU the donated original is actually invalidated)
        state, _ = segment_fn(jax.tree.map(jnp.copy, state_warm), steps=n)
        return float(jax.tree.leaves(state.params)[0].sum())

    if slope_factor and slope_factor > 1:
        long_steps = slope_factor * steps
        go(long_steps)  # compile the long bucket outside the timed window
        t_short = _wall_median(go)
        t_long = _wall_median(lambda: go(long_steps))
        per_step = (t_long - t_short) / (long_steps - steps)
        dt = per_step * steps
        wall_dt = max(t_short - _tunnel_rtt(), 1e-9)
        # tunnel-noise guard: when the two walls land within the RTT jitter
        # the slope degenerates (a 6e13 steps/s artifact was observed);
        # accept the slope only when it is consistent with the single-wall
        # estimate, else keep the conservative single-segment number
        if not (wall_dt / 5 <= dt <= wall_dt * 2):
            _log(f"slope degenerate (slope {dt*1e3:.1f} ms vs wall "
                 f"{wall_dt*1e3:.1f} ms); using single-segment wall")
            dt = wall_dt
    else:
        dt = max(_wall_median(go) - _tunnel_rtt(), 1e-9)
    env_steps = steps * num_envs
    return env_steps / dt, _roofline(flops, bytes_, 1.0 / dt, env_steps, mfu=True)


def bench_dqn_fused(num_envs=128, steps=2000):
    """Fused actor-learner on CartPole: env-steps/s with one SGD/env-step.
    The segment is already one chained on-device scan; slope over segment
    length cancels RTT + transfer. 2000 steps keeps the segment wall an
    order of magnitude above tunnel-RTT jitter (500-step segments swung
    +/-25% run-to-run, measured)."""
    from rl_agents_tpu.envs.cartpole import CartPoleEnv
    from rl_agents_tpu.models import MultiLayerPerceptron

    # ring capacity rounded to a num_envs multiple (~the reference's 50k):
    # an aligned ring writes via one dynamic_update_slice per step instead
    # of a scatter (parallel/actor_learner.py)
    return _bench_fused(CartPoleEnv(max_episode_steps=200),
                        MultiLayerPerceptron(layers=(64, 64), out=2),
                        num_envs, steps, capacity=50_048, batch_size=100)


def bench_dqn_ego_attention(num_envs=64, steps=None):
    """Flagship EgoAttentionNetwork fused learner on the functional highway
    env (BASELINE configs 4-5 recipe: ego_attention.json) — the matmul-heavy
    workload whose MFU answers 'is the learner actually fast'."""
    # 1600-step short / 4800-step long slope buckets: at ~700k env-steps/s
    # the wall delta is ~290 ms — an order of magnitude above tunnel-RTT
    # jitter (400-step buckets left a +/-40% band, VERDICT r4 item 6)
    steps = steps or (40 if _CPU_FALLBACK else 1600)
    from rl_agents_tpu.envs.highway import HighwayEnv
    from rl_agents_tpu.models import EgoAttentionNetwork

    model = EgoAttentionNetwork(out=5, embedding_layers=(64, 64),
                                others_embedding_layers=(64, 64),
                                output_layers=(64,), feature_size=64, heads=4)
    # slope over 400- vs 1200-step segments: cancels RTT + per-segment fixed
    # costs, pinning this latency-bound recipe metric (VERDICT r4 item 6)
    return _bench_fused(HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40),
                        model, num_envs, steps, slope_factor=3,
                        capacity=10_240, batch_size=64)  # aligned ring


def bench_ego_attention_train(num_envs=None, steps=None, batch_size=None,
                              updates_per_step=16):
    # updates_per_step=16 (was 8): the r5 decomposition measured the update
    # alone at 25.7% bf16 MFU with the env-collect residual at ~50% of the
    # fused step — doubling the updates per collected batch amortizes the
    # collection to ~25% and lifts train MFU past the 15% bar.
    """Flagship EgoAttentionNetwork fused learner in the THROUGHPUT-OPTIMAL
    configuration (VERDICT r3 item 1): bf16 activations, large env batch,
    ``updates_per_step`` SGD updates at batch >= 4k per collected env-step
    batch. The reference-recipe metric (dqn_ego_attention_env_steps) is
    latency-bound at batch 100/E=64; this one answers what the same learner
    sustains when configured for throughput, reported with MFU
    (reference workload: common/models.py:157-234 + deep_q_network/pytorch.py:40-80).

    Reported value is SGD samples/s (batch_size x updates_per_step x steps
    per second) — the training-throughput number MFU is computed against."""
    import jax.numpy as jnp

    from rl_agents_tpu.envs.highway import HighwayEnv
    from rl_agents_tpu.models import EgoAttentionNetwork

    import optax

    num_envs = num_envs or (64 if _CPU_FALLBACK else 1024)
    # 48-step segments: 24-step walls still sat close enough to dispatch
    # noise to swing the rate -30% run-to-run (measured: 48 steps gives
    # 14.3-15.0M samples/s across runs, 24 steps 8.7-12.4M)
    steps = steps or (4 if _CPU_FALLBACK else 48)
    batch_size = batch_size or (128 if _CPU_FALLBACK else 8192)
    env = HighwayEnv(vehicles=15, lanes=4, max_episode_steps=40)
    model = EgoAttentionNetwork(out=5, embedding_layers=(64, 64),
                                others_embedding_layers=(64, 64),
                                output_layers=(64,), feature_size=64, heads=4,
                                dtype=jnp.bfloat16)
    env_steps_rate, _ = _bench_fused(
        env, model, num_envs, steps, capacity=65_536, batch_size=batch_size,
        learning_starts=batch_size, updates_per_step=updates_per_step,
        sample_mode="slices" if batch_size % num_envs == 0 else "uniform")
    # the training number is SGD samples/s, not env-steps/s
    sgd_samples_rate = env_steps_rate / num_envs * batch_size * updates_per_step

    # FLOPs for MFU from a standalone compiled double-DQN update: XLA's cost
    # analysis under-counts through the fused loop's lax.cond train gate
    # (measured 175x low), so count the cond-free update program instead
    from rl_agents_tpu.ops.onehot import select_action_values

    obs_shape = env.observation_space.shape
    x = jnp.zeros((batch_size,) + tuple(obs_shape), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1])
    acts = jnp.zeros((batch_size,), jnp.int32)

    def loss(p, s, a, r, ns):
        q_sa = select_action_values(model.apply(p, s), a)
        best = jnp.argmax(model.apply(p, ns), axis=1)
        bv = select_action_values(model.apply(p, ns), best)
        return jnp.mean((q_sa - jax.lax.stop_gradient(r + 0.99 * bv)) ** 2)

    opt = optax.adam(5e-4)

    def update(p, o, s, a, r, ns):
        g = jax.grad(loss)(p, s, a, r, ns)
        u, o = opt.update(g, o, p)
        return optax.apply_updates(p, u), o

    compiled = jax.jit(update).lower(params, opt.init(params), x, acts,
                                     jnp.zeros((batch_size,)), x).compile()
    flops_update, bytes_update = _cost(compiled)
    roof = None
    if flops_update is not None:
        updates_per_sec = sgd_samples_rate / batch_size
        roof = _roofline(flops_update, bytes_update, updates_per_sec,
                         batch_size, mfu=True)
        roof.update(sgd_batch=batch_size, updates_per_step=updates_per_step,
                    env_batch=num_envs, env_steps_per_sec=round(env_steps_rate),
                    flop_count="standalone cond-free update executable")
        try:
            roof["decomposition"] = _train_mfu_decomposition(
                model, opt, params, x, acts, update, flops_update,
                batch_size, updates_per_step, sgd_samples_rate)
        except Exception as e:  # pragma: no cover
            _log(f"train decomposition failed: {e}")
    return sgd_samples_rate, roof


def _train_mfu_decomposition(model, opt, params, x, acts, update, flops_update,
                             batch_size, updates_per_step, sgd_samples_rate):
    """VERDICT r5 item 3: where does the train-vs-serving MFU gap live?

    Chained-timing of the update's components at the exact training shapes
    (bf16 activations, batch ``batch_size``): the full grad+adam update, the
    optimizer application alone, and the inference forward; the residual of
    the fused-loop step over ``updates_per_step`` updates is the env
    collection + replay-sampling share the RL recipe requires."""
    import optax

    # 256-deep chains: at ~0.15-0.3 ms/op, 64 reps left the sub-timings
    # inside tunnel-RTT jitter (update_ms swung 0.08-0.27 across runs)
    reps = 8 if _CPU_FALLBACK else 256
    opt_state0 = opt.init(params)

    # full update, params-chained
    @jax.jit
    def many_updates():
        def body(carry, _):
            p, o = carry
            p, o = update(p, o, x, acts, jnp.zeros((batch_size,)), x)
            return (p, o), None
        (p, _), _ = jax.lax.scan(body, (params, opt_state0), None, length=reps)
        return jnp.sum(jax.tree.leaves(p)[0]).astype(jnp.float32)

    t_update = max((_wall_median(lambda: float(many_updates()))
                    - _tunnel_rtt()) / reps, 1e-9)

    # optimizer-only (adam moments + apply), grads fixed, state-chained
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def many_opt():
        def body(carry, _):
            p, o = carry
            u, o = opt.update(grads, o, p)
            return (optax.apply_updates(p, u), o), None
        (p, _), _ = jax.lax.scan(body, (params, opt_state0), None, length=reps)
        return jnp.sum(jax.tree.leaves(p)[0]).astype(jnp.float32)

    t_opt = max((_wall_median(lambda: float(many_opt())) - _tunnel_rtt())
                / reps, 1e-9)

    # forward-only at the training batch (the 3 forwards of the loss are
    # the update's matmul core alongside the backward)
    @jax.jit
    def many_fwd():
        def body(c, _):
            y = model.apply(params, x * (1.0 + c * 1e-6).astype(x.dtype))
            return jnp.sum(y).astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    t_fwd = max((_wall_median(lambda: float(many_fwd())) - _tunnel_rtt())
                / reps, 1e-9)

    peak = _peak_flops()
    t_fused_step = batch_size * updates_per_step / sgd_samples_rate
    t_updates = updates_per_step * t_update
    t_collect_residual = max(t_fused_step - t_updates, 0.0)
    return {
        "update_ms": round(t_update * 1e3, 4),
        "optimizer_ms": round(t_opt * 1e3, 4),
        "forward_ms": round(t_fwd * 1e3, 4),
        "fused_step_ms": round(t_fused_step * 1e3, 4),
        "updates_share": round(t_updates / t_fused_step, 4),
        "collect_replay_residual_share": round(
            t_collect_residual / t_fused_step, 4),
        "optimizer_share_of_update": round(t_opt / t_update, 4),
        "update_only_mfu_vs_bf16_peak": (
            round(flops_update / t_update / peak, 5) if peak else None),
        "residual_diagnosis": (
            "r5 slope measurement (docs/onehot.md): the in-segment update "
            "costs ~0.48 ms marginal at batch 8192 vs ~0.26 ms for the "
            "identical sample+update body in a top-level chain — the "
            "residual is segment-scan data movement around each update, "
            "NOT optimizer (<5% of the update) and NOT HBM-bound minibatch "
            "traffic (~10 MB/update = 12 us at bandwidth); it caps fused "
            "MFU at ~14.5% while the update math alone runs at ~26%"),
    }


def bench_trailblazer_batched(batch=None, oracle_budget=500):
    """BatchedTrailBlazer at scale (VERDICT r3 item 9): B lockstep instances
    on the loop MDP at a fixed per-instance oracle budget (the anytime cap —
    every other planner is benched at a budget too; TrailBlazer's UNCAPPED
    sample schedule is value-dependent and unbounded in practice), ALL oracle
    draws batched into one padded device dispatch per round.

    Reported value is plans/s; the roofline dict carries dispatches/plan vs
    a single instance's dispatch count — the host-orchestration amortization
    factor — and the residual host-seconds/plan, the honest scaling wall of
    the one host-recursive planner (trailblazer.py:50-140, 224-273)."""
    from rl_agents_tpu.agents.tree_search.trailblazer import (
        BatchedTrailBlazer,
        TrailBlazer,
    )
    from rl_agents_tpu.envs.finite_mdp import make as make_mdp

    batch = batch or (64 if _CPU_FALLBACK else 512)
    env = make_mdp({"mode": "deterministic",
                    "transition": [[0, 1, 2], [0, 3, 2], [0, 1, 3], [3, 1, 2]],
                    "reward": [[0, 1, 0.9], [0, 0, 0.9], [0, 1, 0], [0, 1, 0.9]],
                    "terminal": [0, 0, 0, 0], "max_episode_steps": 10_000})
    env.reset(seed=0)
    kw = dict(gamma=0.5, delta=0.1, epsilon=4.0, max_oracle_calls=oracle_budget)

    single = TrailBlazer(env, **kw)
    single.run()
    states = [env.state] * batch
    # warm run at the SAME batch: _oracle_batch_multi jit-specializes on the
    # pow2-padded (requests, draws) shape, and a cold batch-512 bucket would
    # put a 20-40s remote compile inside the timed window
    BatchedTrailBlazer(env, states, **kw).run()
    t0 = time.time()
    tb = BatchedTrailBlazer(env, states, **kw)
    values = tb.run()
    dt = time.time() - t0
    return batch / dt, {
        "batch": batch,
        "oracle_budget_per_plan": oracle_budget,
        "dispatches_per_plan": round(tb.dispatches / batch, 4),
        "dispatches_single_instance": single.dispatches,
        "dispatch_amortization_x": round(single.dispatches * batch
                                         / max(tb.dispatches, 1), 1),
        "host_seconds_per_plan": round(dt / batch, 4),
        "host_orchestrated": True,
        "root_value": round(float(values[0]), 4),
    }


def bench_ego_attention_serving(batch=16384):
    """Flagship EgoAttentionNetwork forward at serving batch in bf16 — the
    pure-MXU measurement of the model itself (the fused-learner metric is
    latency-bound at RL batch sizes; this one answers 'how fast can the
    flagship model go when the batch is there').

    Each chained step scales the input by a per-step factor: a fixed-point
    chain (or one whose perturbation underflows in bf16) gets CSE'd by XLA
    after unrolling, collapsing both the timing and the flop count
    (measured: 128x). Per-forward FLOPs come from the UN-chained executable
    for the same reason."""
    from rl_agents_tpu.models import EgoAttentionNetwork

    model = EgoAttentionNetwork(out=5, embedding_layers=(64, 64),
                                others_embedding_layers=(64, 64),
                                output_layers=(64,), feature_size=64, heads=4,
                                dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (batch, 15, 7), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), x)
    reps = 16 if _CPU_FALLBACK else 512

    @jax.jit
    def many():
        def step(c, i):
            scale = 1.0 + ((i % 5).astype(jnp.float32) - 2.0) * 0.01 \
                + jnp.tanh(c) * 0.01
            y = model.apply(params, x * scale.astype(jnp.bfloat16))
            return jnp.sum(y).astype(jnp.float32) * 1e-6, None
        c, _ = jax.lax.scan(step, jnp.float32(0), jnp.arange(reps))
        return c

    single = jax.jit(lambda xs: jnp.sum(model.apply(params, xs)))
    flops, bytes_ = _cost(single.lower(x).compile())
    tr = _wall_median(lambda: float(many()))
    dt = max((tr - _tunnel_rtt()) / reps, 1e-9)
    return batch / dt, _roofline(flops, bytes_, 1.0 / dt, batch, mfu=True)


def bench_drop_intersection(expansions=10, models=3):
    """DROP — robust-ensemble OPD (BASELINE config 5a) at B trees on the
    intersection surrogate: every expansion steps all A actions x M model
    variants in lockstep and node bounds aggregate with min over the model
    axis (reference: robust/robust.py:9-71). Reported as expansions/s."""
    from rl_agents_tpu.agents.robust.robust import robust_opd_plan
    from rl_agents_tpu.envs.highway import IntersectionEnv

    env = IntersectionEnv(vehicles=8, max_episode_steps=26)
    base = env.default_params()
    # nominal / aggressive / defensive IDM ensembles (behavior presets)
    presets = [{}, dict(idm_a=4.5, idm_b=6.0, idm_t0=0.8, idm_s0=5.0),
               dict(idm_a=2.0, idm_b=4.0, idm_t0=2.2, idm_s0=15.0)][:models]
    variants = [base._replace(**{k: jnp.float32(v) for k, v in p.items()})
                for p in presets]
    params_ens = jax.tree.map(lambda *xs: jnp.stack(xs), *variants)
    Bd = min(B, 1024)
    keys = jax.random.split(jax.random.PRNGKey(4), Bd)
    states0, _ = jax.vmap(env.reset, in_axes=(None, 0))(base, keys)
    statesM = jax.tree.map(
        lambda x: jnp.broadcast_to(x[:, None], (Bd, models) + x.shape[1:]), states0)
    A = env.action_space.n

    def step(c):
        ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, c.astype(jnp.int32))
        a, _, _ = jax.vmap(robust_opd_plan,
                           in_axes=(None, None, 0, 0) + (None,) * 5)(
            env, params_ens, statesM, ks, A, models, expansions, GAMMA, 0.0)
        return jnp.sum(a).astype(jnp.float32) * 1e-9

    dt, flops, bytes_ = chained_seconds_per_op(step, reps=REPS if _CPU_FALLBACK
                                               else 48)
    n_exp = Bd * expansions
    roof = _roofline(flops, bytes_, 1.0 / dt, n_exp)
    if roof is not None:
        roof.update(trees=Bd, models=models, actions=A)
    return n_exp / dt, roof


def bench_bftq_fit(n_states=None, regression_epochs=50):
    """BFTQ fit epoch (BASELINE config 5b): budgeted Bellman targets
    (forward over the S x B state-budget product + vmapped Pareto hulls +
    optimal mixtures, reference bftq.py:190-250) followed by the regression
    fit (bftq.py:252-305), on intersection-shaped transitions. Reported as
    states/s through the full epoch."""
    import numpy as np
    import optax

    from rl_agents_tpu.agents.budgeted_ftq.bftq import BFTQBatch, BudgetedFittedQ
    from rl_agents_tpu.agents.budgeted_ftq.models import BudgetedMLP

    S = n_states or (256 if _CPU_FALLBACK else 4096)
    D, A, NB = 15 * 5, 3, 10  # flattened intersection kinematics obs, SLOWER/IDLE/FASTER
    rng = np.random.default_rng(0)
    batch = BFTQBatch(
        state=jnp.asarray(rng.normal(size=(S, D)).astype(np.float32)),
        action=jnp.asarray(rng.integers(0, A, S).astype(np.int32)),
        reward=jnp.asarray(rng.uniform(size=S).astype(np.float32)),
        next_state=jnp.asarray(rng.normal(size=(S, D)).astype(np.float32)),
        terminal=jnp.asarray(rng.uniform(size=S) < 0.05),
        cost=jnp.asarray((rng.uniform(size=S) < 0.1).astype(np.float32)),
        beta=jnp.asarray(rng.uniform(size=S).astype(np.float32)),
    )
    net = BudgetedMLP(size_state=D, n_actions=A, layers=(64, 64))
    bftq = BudgetedFittedQ(net, {
        "gamma": 0.9, "gamma_c": 0.9, "betas_for_duplication": [],
        "betas_for_discretisation": f"np.linspace(0, 1, {NB})",
        "loss_function": "l2", "loss_function_c": "l2",
        "weights_losses": [1.0, 1.0], "epochs": 1,
        "regression_epochs": regression_epochs, "clamp_qc": None,
        "reset_network_each_epoch": False,
        "optimizer": {"type": "ADAM", "learning_rate": 1e-3},
    })
    bftq.optimizer = optax.adam(1e-3)
    bftq.opt_state = bftq.optimizer.init(bftq.params)
    bftq._fit_fn = bftq._make_fit(bftq.optimizer, regression_epochs)
    betas_disc = bftq.betas_for_discretisation
    sb = jnp.concatenate([batch.state, batch.beta[:, None]], axis=1)

    params0, opt0 = bftq.params, bftq.opt_state

    @jax.jit
    def epoch(params, opt_state):
        tr, tc = bftq._compute_targets(params, batch, betas_disc,
                                       jnp.asarray(True))
        params, opt_state, losses = bftq._fit_fn(params, opt_state, sb,
                                                 batch.action, tr, tc)
        return params, opt_state, losses[-1]

    flops, bytes_ = _cost(epoch.lower(params0, opt0).compile())

    reps = 2 if _CPU_FALLBACK else 8

    @jax.jit
    def many():
        def step(carry, _):
            params, opt_state = carry
            params, opt_state, _ = epoch(params, opt_state)
            return (params, opt_state), None
        (params, _), _ = jax.lax.scan(step, (params0, opt0), None, length=reps)
        return jnp.sum(jax.tree.leaves(params)[0]).astype(jnp.float32)

    tr_wall = _wall_median(lambda: float(many()))
    dt = max((tr_wall - _tunnel_rtt()) / reps, 1e-9)
    roof = _roofline(flops, bytes_, 1.0 / dt, S)
    if roof is not None:
        roof.update(states=S, betas=NB, regression_epochs=regression_epochs,
                    state_dim=D)
    return S / dt, roof


def _bootstrap_reference():
    sys.path.insert(0, "/root/reference")
    import types

    import numpy as np

    np.infty = np.inf
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba


def _cpu_highway_handle(env_cls, **kwargs):
    """An EnvHandle over a functional surrogate whose jitted step runs on the
    HOST CPU — the reference planners' natural in-process substrate (a
    tunnel-dispatched step would bill them ~27 ms of RTT per call)."""
    from rl_agents_tpu.envs.base import EnvHandle

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        env = env_cls(**kwargs)
        handle = EnvHandle(env, env.default_params())
        handle.reset(seed=0)
    return handle


class _GeneratorShim:
    """Old RandomState spelling over the Generator the reference seeds
    (e.g. graph_based_stochastic.py:239 calls np_random.randint)."""

    def __init__(self, gen):
        self._gen = gen

    def randint(self, n):
        return self._gen.integers(n)

    def __getattr__(self, name):
        return getattr(self._gen, name)


class _FourTupleEnv:
    """Pre-truncation gym API adapter: several reference planners unpack
    4-tuples from env.step (e.g. graph_based.py:47)."""

    def __init__(self, handle):
        self._h = handle

    def step(self, action):
        obs, reward, term, trunc, _ = self._h.step(action)
        return obs, reward, term or trunc, {}

    def __getattr__(self, name):
        return getattr(self._h, name)


def bench_reference_mcts_highway(trials=2):
    """Reference python MCTS on the repo's functional highway surrogate via
    the handle layer (CPU-jitted steps, in-process), same budget/temperature
    as the fused metric — env-steps/s."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    from rl_agents_tpu.envs.highway import HighwayEnv

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        handle = _cpu_highway_handle(HighwayEnv, vehicles=15, lanes=4,
                                     max_episode_steps=40)
        planner = MCTS(handle, MCTSAgent.random_policy, MCTSAgent.random_policy,
                       {"budget": EPISODES * HORIZON, "gamma": GAMMA,
                        "temperature": TEMPERATURE, "horizon": None,
                        "closed_loop": False})
        planner.seed(0)
        planner.step_by_reset()
        planner.plan(state=handle.fork(), observation=None)  # warm-up
        planner.observations = []
        steps = 0
        t0 = time.time()
        for _ in range(trials):
            planner.step_by_reset()
            planner.plan(state=handle.fork(), observation=None)
            steps += len(planner.observations)
            planner.observations = []
        dt = time.time() - t0
    return steps / dt


def bench_reference_gbop_highway(trials=2, expansions=12):
    """Reference python GBOP-D (str-keyed node dict + queue-based partial VI,
    graph_based.py:12-151) on the repo's functional highway surrogate via
    the handle layer (CPU-jitted steps) — expansions/s."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search.graph_based import GraphBasedPlanner

    from rl_agents_tpu.envs.highway import HighwayEnv

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        handle = _cpu_highway_handle(HighwayEnv, vehicles=15, lanes=4,
                                     max_episode_steps=40)
        obs0 = handle.reset(seed=0)[0]
        planner = GraphBasedPlanner(handle, {
            "budget": expansions * 5, "gamma": GAMMA, "accuracy": 1e-2,
            "sampling_timeout": 100, "step_strategy": "reset"})
        planner.seed(0)
        planner.plan(state=_FourTupleEnv(handle.fork()), observation=obs0)
        t0 = time.time()
        for _ in range(trials):
            planner.nodes = {}
            planner.updates_count.clear()
            planner.plan(state=_FourTupleEnv(handle.fork()), observation=obs0)
        dt = time.time() - t0
    return trials * expansions / dt


def bench_reference_gbop_stochastic_highway(trials=2, episodes=8, horizon=4):
    """Reference python stochastic GBOP on the repo's functional highway
    surrogate — sample-steps/s. The reference's ``compute_reward_ucb`` is
    broken as shipped (passes a leftover positional into the new
    kl_upper_bound signature, graph_based_stochastic.py:75-84 — a TypeError
    on every run); the intended call is patched in, exactly as the
    equivalence test documents (test_family_equivalence.py)."""
    _bootstrap_reference()
    from rl_agents.agents.tree_search import graph_based_stochastic as ref_mod
    from rl_agents.agents.tree_search.graph_based_stochastic import (
        StochasticGraphBasedPlanner,
    )
    from rl_agents.utils import kl_upper_bound

    from rl_agents_tpu.envs.highway import HighwayEnv

    def fixed_compute_reward_ucb(self):
        time_ = self.planner.config["episodes"]  # noqa: F841 (eval context)
        threshold = eval(self.planner.config["upper_bound"]["threshold"],
                         {"np": __import__("numpy"), "time": time_})
        if threshold == 0:
            self.mu_ucb = self.mu_lcb = self.cumulative_reward / self.count
        else:
            self.mu_ucb = kl_upper_bound(self.cumulative_reward, self.count,
                                         threshold=threshold)
            self.mu_lcb = kl_upper_bound(self.cumulative_reward, self.count,
                                         threshold=threshold, lower=True)

    ref_mod.GraphDecisionNode.compute_reward_ucb = fixed_compute_reward_ucb

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        handle = _cpu_highway_handle(HighwayEnv, vehicles=15, lanes=4,
                                     max_episode_steps=40)
        obs0 = handle.reset(seed=0)[0]
        planner = StochasticGraphBasedPlanner(handle, {
            "budget": episodes * horizon, "episodes": episodes,
            "horizon": horizon, "gamma": GAMMA, "accuracy": 1e-2,
            "sampling_timeout": 100, "max_next_states_count": 1,
            "step_strategy": "reset",
            "upper_bound": {"type": "kullback-leibler", "time": "global",
                            "threshold": "2*np.log(time)",
                            "transition_threshold": "2*np.log(time)"}})
        planner.seed(0)
        planner.np_random = _GeneratorShim(planner.np_random)
        planner.plan(state=_FourTupleEnv(handle.fork()), observation=obs0)
        t0 = time.time()
        for _ in range(trials):
            planner.nodes = {}
            planner.plan(state=_FourTupleEnv(handle.fork()), observation=obs0)
        dt = time.time() - t0
    return trials * episodes * horizon / dt


def bench_reference_drop_intersection(trials=2, expansions=10, models=3):
    """Reference DROP — DiscreteRobustPlanner over a joint env of M model
    variants (robust/robust.py:9-71) on the repo's functional intersection
    surrogate — expansions/s. The reference's own JointEnv returns gym
    4-tuples which its updated DeterministicNode no longer unpacks
    (deterministic.py:41); this adapter restores the 5-tuple its planner
    expects, preserving JointEnv semantics."""
    import numpy as np

    _bootstrap_reference()
    from rl_agents.agents.robust.robust import DiscreteRobustPlanner

    from rl_agents_tpu.envs.base import EnvHandle
    from rl_agents_tpu.envs.highway import IntersectionEnv

    class JointEnv5:
        def __init__(self, handles):
            self.joint_state = handles

        def step(self, action):
            outs = [h.step(action) for h in self.joint_state]
            obs, rewards, terms, truncs, infos = zip(*outs)
            return (obs, np.array(rewards), np.array(terms),
                    np.array(truncs), infos)

        @property
        def action_space(self):
            return self.joint_state[0].action_space

        def get_available_actions(self):
            return list(range(self.action_space.n))

    presets = [{}, dict(idm_a=4.5, idm_b=6.0, idm_t0=0.8, idm_s0=5.0),
               dict(idm_a=2.0, idm_b=4.0, idm_t0=2.2, idm_s0=15.0)][:models]
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        handles = []
        for preset in presets:
            env = IntersectionEnv(vehicles=8, max_episode_steps=26)
            params = env.default_params()._replace(
                **{k: jnp.float32(v) for k, v in preset.items()})
            h = EnvHandle(env, params)
            h.reset(seed=0)
            handles.append(h)
        A = handles[0].action_space.n
        joint = JointEnv5([h.fork() for h in handles])
        planner = DiscreteRobustPlanner(joint, {
            "budget": expansions * A, "gamma": GAMMA, "step_strategy": "reset",
            "terminal_reward": 0})
        planner.seed(0)

        def one_plan():
            planner.reset()
            planner.plan(state=JointEnv5([h.fork() for h in handles]),
                         observation=None)

        one_plan()  # warm-up
        t0 = time.time()
        for _ in range(trials):
            one_plan()
        dt = time.time() - t0
    return trials * expansions / dt


def bench_reference_bftq_fit(n_states=None, regression_epochs=50):
    """Reference BFTQ epoch — torch forward over the S x B product, the
    Pool/scipy-qhull Pareto frontier per state, optimal mixtures, then the
    regression fit (bftq.py:150-305) — states/s on CPU, its natural
    substrate. Frontier plotting (instrumentation, not algorithm) is
    stubbed out."""
    import numpy as np
    import torch

    _bootstrap_reference()
    from rl_agents.agents.budgeted_ftq import bftq as ref_bftq_mod
    from rl_agents.agents.budgeted_ftq.bftq import BudgetedFittedQ
    from rl_agents.agents.budgeted_ftq.models import BudgetedMLP

    ref_bftq_mod.plot_frontier = lambda *a, **k: None
    ref_bftq_mod.plot_values_histograms = lambda *a, **k: None

    def boostrap_next_values(self, next_states, betas, terminals):
        """Faithful copy of bftq.py:150-188 with ONE fix: current torch
        rejects assigning numpy.float32 into a FloatTensor (the reference
        predates that), so the mixture expectations are cast to float.
        Same forwards, hulls and mixtures — the timed workload is unchanged."""
        next_rewards = torch.zeros(len(next_states), device=self.device)
        next_costs = torch.zeros(len(next_states), device=self.device)
        if self.epoch == 0:
            return next_rewards, next_costs
        next_states_nf = next_states[~terminals]
        betas_nf = betas[~terminals]
        q_values = self.compute_next_values(next_states_nf)
        hulls = self.compute_all_frontiers(q_values, len(next_states_nf))
        mixtures = self.compute_all_optimal_mixtures(hulls, betas_nf)
        next_rewards_nf = torch.zeros(len(next_states_nf), device=self.device)
        next_costs_nf = torch.zeros(len(next_states_nf), device=self.device)
        for i, mix in enumerate(mixtures):
            next_rewards_nf[i] = float((1 - mix.probability_sup) * mix.inf.qr
                                       + mix.probability_sup * mix.sup.qr)
            next_costs_nf[i] = float((1 - mix.probability_sup) * mix.inf.qc
                                     + mix.probability_sup * mix.sup.qc)
        next_rewards[~terminals] = next_rewards_nf
        next_costs[~terminals] = next_costs_nf
        return next_rewards, next_costs

    ref_bftq_mod.BudgetedFittedQ.boostrap_next_values = boostrap_next_values

    S = n_states or (64 if _CPU_FALLBACK else 512)
    D, A, NB = 15 * 5, 3, 10
    torch.manual_seed(0)
    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    net = BudgetedMLP(size_state=D, size_beta_encoder=10, layers=[64, 64],
                      n_actions=A)
    bftq = BudgetedFittedQ(net, {
        "gamma": 0.9, "gamma_c": 0.9, "epochs": 1, "delta_stop": 0.0,
        "memory_capacity": 100000, "beta": 0,
        "betas_for_duplication": "[]", "betas_for_discretisation":
            f"np.linspace(0, 1, {NB})",
        "exploration": {"temperature": 1.0, "final_temperature": 0.1,
                        "tau": 5000},
        "optimizer": {"type": "ADAM", "learning_rate": 1e-3,
                      "weight_decay": 1e-3},
        "loss_function": "l2", "loss_function_c": "l2",
        "regression_epochs": regression_epochs, "clamp_qc": None,
        "nn_loss_stop_condition": 0.0, "weights_losses": [1.0, 1.0],
        "split_batches": 1, "processes": 1, "samples_per_batch": S,
        "device": "cpu",
        "hull_options": {"decimals": None, "qhull_options": "",
                         "remove_duplicates": False, "library": "scipy"},
        "reset_network_each_epoch": False})
    rng = np.random.default_rng(0)
    for i in range(S):
        bftq.push(rng.normal(size=D).astype(np.float32), int(rng.integers(A)),
                  float(rng.uniform()), rng.normal(size=D).astype(np.float32),
                  bool(rng.uniform() < 0.05), float(rng.uniform() < 0.1),
                  float(rng.uniform()))
    bftq.epoch = 1  # past the bootstrap-free epoch: hulls + mixtures run
    (states_betas, actions, rewards, costs, next_states, betas,
     terminals) = bftq._zip_batch()
    t0 = time.time()
    target_r, target_c = bftq.compute_targets(rewards, costs, next_states,
                                              betas, terminals)
    bftq._fit(states_betas, actions, target_r, target_c)
    dt = time.time() - t0
    return S / dt


def bench_reference_dqn_ego_attention(steps=None):
    """Reference torch EgoAttention DQN (CPU) driven by the repo's
    functional highway surrogate via the handle layer: act + record with one
    SGD (batch 64) per env step — env-steps/s and SGD samples/s
    (reference: common/models.py:237-312 + deep_q_network/pytorch.py:40-80)."""
    import torch

    _bootstrap_reference()
    from rl_agents.agents.deep_q_network.pytorch import DQNAgent

    from rl_agents_tpu.envs.highway import HighwayEnv

    steps = steps or (20 if _CPU_FALLBACK else 200)
    torch.manual_seed(0)
    torch.set_num_threads(max(os.cpu_count() - 1, 1))

    class _GymSpacesEnv:
        """Expose gymnasium spaces: the reference DQN asserts
        isinstance(action_space, gymnasium.spaces.Discrete)."""

        def __init__(self, handle):
            import gymnasium as gym
            self._h = handle
            self.action_space = gym.spaces.Discrete(handle.action_space.n)
            shape = handle.observation_space.shape
            self.observation_space = gym.spaces.Box(-1.0, 1.0, shape=shape)

        def __getattr__(self, name):
            return getattr(self._h, name)

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        handle = _GymSpacesEnv(_cpu_highway_handle(
            HighwayEnv, vehicles=15, lanes=4, max_episode_steps=40))
        agent = DQNAgent(handle, {
            "model": {"type": "EgoAttentionNetwork",
                      "embedding_layer": {"type": "MultiLayerPerceptron",
                                          "layers": [64, 64],
                                          "reshape": False, "in": 5},
                      "others_embedding_layer": {
                          "type": "MultiLayerPerceptron", "layers": [64, 64],
                          "reshape": False, "in": 5},
                      "self_attention_layer": None,
                      "output_layer": {"type": "MultiLayerPerceptron",
                                       "layers": [64], "reshape": False},
                      "attention_layer": {"type": "EgoAttention",
                                          "feature_size": 64, "heads": 4}},
            "batch_size": 64, "memory_capacity": 10000,
            "exploration": {"tau": 6000}, "device": "cpu"})
        agent.seed(0)
        obs, _ = handle.reset(seed=0)

        def loop(n):
            nonlocal obs
            import numpy as np
            for _ in range(n):
                action = agent.act(np.asarray(obs))
                nxt, reward, term, trunc, _ = handle.step(int(action))
                agent.record(np.asarray(obs), action, reward, np.asarray(nxt),
                             term or trunc, {})
                obs = nxt
                if term or trunc:
                    obs, _ = handle.reset()

        loop(80)  # warm-up: fill memory past batch_size so SGD runs each step
        t0 = time.time()
        loop(steps)
        dt = time.time() - t0
    return steps / dt * 64  # SGD samples/s (batch 64, one update per step)


def bench_reference_opd_cartpole(trials=3, budget=230):
    """Reference OPD (python object tree + per-expansion deepcopy) on
    gymnasium's numpy CartPole — its natural dispatch-free substrate —
    at the same budget as the repo's OPD metric: expansions/s
    (reference: tree_search/deterministic.py:91-122)."""
    _bootstrap_reference()
    import gymnasium as gym
    from rl_agents.agents.tree_search.deterministic import (
        OptimisticDeterministicPlanner,
    )

    env = gym.make("CartPole-v1")
    env.reset(seed=0)
    planner = OptimisticDeterministicPlanner(
        env, {"budget": budget, "gamma": GAMMA, "step_strategy": "reset",
              "terminal_reward": 0})
    planner.seed(0)
    planner.reset()
    planner.plan(state=env, observation=None)  # warm-up
    expansions = budget // env.action_space.n
    t0 = time.time()
    for _ in range(trials):
        planner.reset()
        planner.plan(state=env, observation=None)
    dt = time.time() - t0
    return trials * expansions / dt


def bench_reference_dqn_cartpole(steps=400):
    """Reference torch DQN (CPU) on gymnasium CartPole, one SGD per env
    step once the memory fills — its natural single-env act/record loop —
    env-steps/s (reference: deep_q_network/pytorch.py:40-80 +
    abstract.py:37-83; same 64x64 MLP/batch 100 as the repo's fused metric)."""
    _bootstrap_reference()
    import gymnasium as gym
    import torch
    from rl_agents.agents.deep_q_network.pytorch import DQNAgent

    torch.manual_seed(0)
    torch.set_num_threads(max(os.cpu_count() - 1, 1))
    env = gym.make("CartPole-v1")
    agent = DQNAgent(env, {
        "model": {"type": "MultiLayerPerceptron", "layers": [64, 64]},
        "batch_size": 100, "memory_capacity": 50_000,
        "exploration": {"tau": 6000}, "device": "cpu"})
    agent.seed(0)
    obs, _ = env.reset(seed=0)

    def loop(n):
        nonlocal obs
        for _ in range(n):
            action = agent.act(obs)
            next_obs, reward, terminated, truncated, _ = env.step(int(action))
            done = terminated or truncated
            agent.record(obs, action, reward, next_obs, done, {})
            obs = next_obs
            if done:
                obs, _ = env.reset()

    loop(150)  # warm-up: fill memory past batch_size so SGD runs each step
    t0 = time.time()
    loop(steps)
    return steps / (time.time() - t0)


def bench_reference_mcts_cartpole(trials=3):
    """Reference MCTS (python object tree) on gymnasium's numpy CartPole —
    the reference's natural substrate, zero JAX dispatch in the loop."""
    _bootstrap_reference()
    import gymnasium as gym
    from rl_agents.agents.tree_search.mcts import MCTS, MCTSAgent

    env = gym.make("CartPole-v1")
    env.reset(seed=0)
    planner = MCTS(env, MCTSAgent.random_policy, MCTSAgent.random_policy,
                   {"budget": EPISODES * HORIZON, "gamma": GAMMA,
                    "temperature": TEMPERATURE, "horizon": None,
                    "closed_loop": False})
    planner.seed(0)
    planner.step_by_reset()
    planner.plan(state=env, observation=None)  # warm-up
    planner.observations = []
    steps = 0
    t0 = time.time()
    for _ in range(trials):
        planner.step_by_reset()
        planner.plan(state=env, observation=None)
        steps += len(planner.observations)
        planner.observations = []
    dt = time.time() - t0
    return steps / dt


def main():
    _log("start")
    _probe_device_or_fall_back()
    value, head_roof = bench_mcts_cartpole()
    _log(f"mcts_cartpole done: {value:.3e}")
    extra, roofline = {}, {"device_kind": jax.devices()[0].device_kind,
                           "peak_flops_bf16": _peak_flops(),
                           "mcts_cartpole": head_roof}
    for name, fn in [("mcts_highway_steps_per_sec", bench_mcts_highway),
                     ("opd_highway_expansions_per_sec", bench_opd_highway),
                     ("gbop_highway_expansions_per_sec", bench_gbop_highway),
                     ("gbop_stochastic_sample_steps_per_sec",
                      bench_gbop_stochastic_highway),
                     ("dqn_fused_env_steps_per_sec", bench_dqn_fused),
                     ("dqn_ego_attention_env_steps_per_sec",
                      bench_dqn_ego_attention),
                     ("ego_attention_train_sgd_samples_per_sec",
                      bench_ego_attention_train),
                     ("trailblazer_batched_plans_per_sec",
                      bench_trailblazer_batched),
                     ("drop_intersection_expansions_per_sec",
                      bench_drop_intersection),
                     ("bftq_fit_states_per_sec", bench_bftq_fit),
                     ("ego_attention_serving_fwd_per_sec",
                      bench_ego_attention_serving)]:
        try:
            val, roof = fn()
            extra[name] = round(val)
            roofline[name.rsplit("_per_sec", 1)[0]] = roof
            _log(f"{name} done: {extra[name]:.3e}")
        except Exception as e:  # pragma: no cover - report partial results
            print(f"{name} failed: {e}", file=sys.stderr)
            extra[name] = None
    try:
        baseline = bench_reference_mcts_cartpole()
    except Exception as e:
        print(f"reference baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else None

    # reference denominators for the extras (VERDICT r3 items 6/8): each a
    # measured reference-planner/learner rate on ITS natural substrate
    extra_vs_baseline = {}
    for name, ref_fn, method in [
        ("opd_highway_expansions_per_sec", bench_reference_opd_cartpole,
         "reference python OPD on gymnasium CartPole-v1 (numpy substrate, "
         "per-expansion deepcopy), budget 230 — expansions/s"),
        ("dqn_fused_env_steps_per_sec", bench_reference_dqn_cartpole,
         "reference torch DQN (CPU) on gymnasium CartPole-v1, one SGD per "
         "env step, 64x64 MLP batch 100 — env-steps/s"),
        ("mcts_highway_steps_per_sec", bench_reference_mcts_highway,
         "reference python MCTS on the repo's functional highway surrogate "
         "via the handle layer (CPU-jitted steps, in-process), same "
         "budget/temperature — env-steps/s"),
        ("gbop_highway_expansions_per_sec", bench_reference_gbop_highway,
         "reference python GBOP-D (str-keyed nodes, queue partial-VI) on "
         "the repo's functional highway surrogate via the handle layer "
         "(CPU-jitted steps), budget 60/accuracy 1e-2 — expansions/s"),
        ("gbop_stochastic_sample_steps_per_sec",
         bench_reference_gbop_stochastic_highway,
         "reference python stochastic GBOP (compute_reward_ucb signature "
         "patched as documented in test_family_equivalence.py) on the "
         "repo's functional highway surrogate, episodes=8/horizon=4, "
         "max_next_states_count=1 — sample-steps/s"),
        ("drop_intersection_expansions_per_sec",
         bench_reference_drop_intersection,
         "reference DROP: DiscreteRobustPlanner over a 3-model joint env "
         "(5-tuple-adapted JointEnv, robust.py:9-71) on the repo's "
         "functional intersection surrogate, budget 30 — expansions/s"),
        ("bftq_fit_states_per_sec", bench_reference_bftq_fit,
         "reference BFTQ epoch: torch forward over S x 10 budgets, "
         "scipy-qhull Pareto frontier per state + optimal mixtures + "
         "50-epoch regression (bftq.py:150-305), S=512, CPU — states/s"),
        ("ego_attention_train_sgd_samples_per_sec",
         bench_reference_dqn_ego_attention,
         "reference torch EgoAttention DQN (CPU) on the repo's functional "
         "highway surrogate via the handle layer, one SGD of batch 64 per "
         "env step — SGD samples/s"),
    ]:
        if not extra.get(name):
            continue
        try:
            ref_val = ref_fn()
            extra_vs_baseline[name] = {
                "vs_baseline": round(extra[name] / ref_val, 1),
                "baseline_value": round(ref_val, 1),
                "baseline_method": method,
            }
            _log(f"{name} baseline done: {ref_val:.3e} "
                 f"({extra_vs_baseline[name]['vs_baseline']}x)")
        except Exception as e:  # pragma: no cover
            print(f"{name} baseline failed: {e}", file=sys.stderr)
    record = {
        "metric": f"mcts_cartpole_env_steps_per_sec_{B}trees",
        "value": round(value),
        "unit": "env-steps/s/chip",
        "device": jax.default_backend(),
        "trees": B,
        "vs_baseline": round(vs, 1) if vs else None,
        "baseline_method": ("reference python MCTS on gymnasium CartPole-v1 "
                            "(numpy substrate), same budget=184/episodes=23/"
                            "horizon=8/temperature=40"),
        "baseline_value": round(baseline) if baseline else None,
        "timing_method": ("slope of chained dependent lax.scan reps with "
                          "forced scalar transfer (cancels tunnel RTT; "
                          "block_until_ready is enqueue-only on axon)"),
        "extra": extra,
        "extra_vs_baseline": extra_vs_baseline,
        "roofline": roofline,
    }
    if jax.default_backend() != "cpu":
        try:
            _LAST_DEVICE_PATH.write_text(json.dumps(
                dict(record, recorded_at=time.strftime("%Y-%m-%dT%H:%M:%S"))))
        except OSError as e:  # pragma: no cover
            _log(f"could not persist last_device_run: {e}")
    elif _LAST_DEVICE_PATH.exists():
        # dead tunnel: the CPU line carries the most recent device record so
        # the perf evidence of record survives the fallback
        try:
            record["last_device_run"] = json.loads(_LAST_DEVICE_PATH.read_text())
        except (OSError, ValueError):
            pass
    print(json.dumps(record))


if __name__ == "__main__":
    main()
