"""Typed configuration for dreamer_tpu.

The reference uses a flat 51-key YAML dict destructured key-by-key
(reference: Dreamer.py:20-64, train_car_racer.py:59-60).  We provide a typed
dataclass tree with (a) a compat loader for the reference's flat key names so
the shipped ``car_racer_config.yaml`` loads unchanged, and (b) dotted-path CLI
overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml


@dataclass
class WorldModelConfig:
    """Architecture + optimiser of the world model (reference: WorldModel.py:12-70)."""

    hidden_dim: int = 600                 # GRU deterministic state (hidden_state_dims)
    latent_rows: int = 32                 # categorical latent: rows x classes
    latent_classes: int = 32
    obs_size: Tuple[int, int] = (64, 64)  # (H, W); channels fixed at 3
    encoder_filters_1: int = 32
    encoder_filters_2: int = 64
    encoder_hidden: int = 200             # latent_mapper hidden width
    decoder_filters_1: int = 32
    decoder_filters_2: int = 64
    decoder_hidden: int = 200             # upscaler hidden width
    dyn_hidden_1: int = 200
    dyn_hidden_2: int = 200
    rew_hidden_1: int = 200
    rew_hidden_2: int = 200
    cont_hidden_1: int = 200
    cont_hidden_2: int = 200
    reward_buckets: int = 255             # twohot buckets over symlog rewards
    unimix: float = 0.01                  # 1% uniform mix (VariationalAutoEncoder.py:91-92)
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-5
    weight_decay: float = 1e-6            # WorldModel.py:68
    grad_clip: float = 100.0              # WorldModel.py:198
    beta_pred: float = 1.0                # loss weights (car_racer_config.yaml:49-51)
    beta_dyn: float = 0.5
    beta_rep: float = 0.1
    free_bits: float = 1.0                # max(1, E[KL]) — WorldModel.py:187-188
    # Paper-correct free bits (DreamerV3 eq. 5): clip each state's KL at the
    # floor BEFORE the batch mean.  The reference floors AFTER the mean
    # (WorldModel.py:187-188), which zeroes the whole KL gradient whenever
    # the mean dips under 1 nat.  Off by default for parity.
    free_bits_per_sample: bool = False
    # Zero the RSSM carry (h, z) and incoming action at env auto-reset
    # boundaries inside sampled training windows (is_first = 1 - cont[t-1]).
    # The reference only per-step-masks the LOSS at the terminal step
    # (WorldModel.py:170-173) and carries recurrent state across the reset —
    # invisible on CarRacing's fixed 1000-step episodes, but on
    # early-terminating envs most windows straddle a boundary and the world
    # model trains on cross-episode transitions (diagnosed as the LunarLander
    # -136 -> -411 failure).  Off by default for reference parity; enabled in
    # the terminating-env configs (lunar_lander, bipedal_walker).
    reset_on_episode_start: bool = False
    # Loss weight on TERMINAL targets (continue=0) in the reward/continue
    # heads, under env.next_step_autoreset.  Terminal examples are ~2-3% of
    # steps but carry the env's +-100 terminal rewards; at weight 1 the heads
    # learn ambient "late-episode" statistics long before the terminal spike
    # (probed round 5: env crash reward -110 vs predicted -5.3, pred_cont
    # 0.8-0.96 AT the crash frame, tools/probe_terminal_reward.py) — and a
    # cont head that truncates dreams before the reward head has learned the
    # crash penalty makes crashing a free ESCAPE from negative shaping in
    # imagination (measured: done_frac rose, eval fell after the cont head
    # woke up).  1.0 = parity (no reweighting, byte-identical HLO).
    terminal_loss_weight: float = 1.0

    @property
    def latent_dim(self) -> int:
        return self.latent_rows * self.latent_classes


@dataclass
class AgentConfig:
    """Actor-critic architecture + optimisers (reference: Agent.py:7-76)."""

    actor_hidden_1: int = 200
    actor_hidden_2: int = 200
    critic_hidden_1: int = 200
    critic_hidden_2: int = 200
    critic_buckets: int = 255
    actor_lr: float = 8e-5
    actor_betas: Tuple[float, float] = (0.9, 0.999)
    actor_eps: float = 1e-5
    critic_lr: float = 1e-4
    critic_betas: Tuple[float, float] = (0.9, 0.999)
    critic_eps: float = 1e-5
    weight_decay: float = 1e-6
    grad_clip: float = 100.0              # Agent.py:147-148
    nu: float = 3e-4                      # entropy coefficient (Agent.py:124)
    # Policy sigma floor: sigma = softplus(clamped log_sig) + min_std.  The
    # reference hard-codes 1e-3 (Agent.py:199); ~0.1 prevents the entropy
    # collapse that killed the round-1 long CarRacing run after its peak.
    min_std: float = 1e-3
    # Entropy bonus form.  False (parity): the reference's single-sample
    # -log pi(a) of the tanh-squashed density (Agent.py:124) — biased toward
    # saturated actions (log|det J| -> +inf as |a| -> 1) and noisy.  True:
    # the analytic base-Normal entropy (DreamerV3 paper), which depends only
    # on sigma and regularises exploration directly (core/dists.py
    # normal_entropy).  Candidate fix for the rise-then-fade pattern when
    # sigma pins at min_std.
    analytic_entropy: bool = False
    lambda_: float = 0.95
    gamma: float = 0.99
    target_tau: float = 0.02              # soft target update (Agent.py:90)
    s_ema: float = 0.99                   # return-scale EMA smoothing (Agent.py:61)


@dataclass
class TrainConfig:
    """Training loop schedule (reference: car_racer_config.yaml:27-48, Dreamer.py:324-372)."""

    horizon: int = 30                     # WM unroll length == imagination length
    batch_size: int = 50
    sequence_length: int = 50             # replay sample length; also env steps per iter
    buffer_size: int = 200_000
    training_iterations: int = 10_000
    random_iterations: int = 500
    wm_epochs: int = 2
    ac_epochs: int = 2
    seed: int = 42
    eval_every: int = 500
    eval_episodes: int = 3
    final_eval_episodes: int = 10
    checkpoint_every: int = 1000
    log_every: int = 1000
    # Resume hygiene: when a run resumes WITHOUT a checkpointed replay ring
    # (runtime.checkpoint_replay=false), the buffer refills exclusively with
    # the current near-deterministic policy's data — the world model then
    # degrades on the low-diversity distribution and eval craters (observed:
    # 352 -> -82 after a mid-run resume).  A nonzero value re-primes the
    # empty ring with this many random-policy rollout rounds before training
    # continues (idempotent: skipped if the restored ring already holds that
    # much data, e.g. when the replay ring IS checkpointed).
    resume_prime_iterations: int = 0


@dataclass
class EnvConfig:
    env_id: str = "CarRacing-v3"
    action_dim: int = 3
    action_repeat: int = 4
    num_envs: int = 1                     # vectorized env farm size (reference: 1)
    async_envs: bool = False              # subprocess farm (AsyncEnvFarm) for many envs
    # NEXT_STEP autoreset: keep the TERMINAL observation (the reference's
    # same-step reset discards it, Dreamer.py:214-223) and delay the env
    # reset by one step.  With it, the replay ring stores an explicit
    # is-first channel, and the WM pred losses train the terminal example —
    # (crash-frame latent -> terminal reward / continue=0) — which the
    # reference masks out entirely (WorldModel.py:170-173: mask = the cont
    # targets themselves).  Without terminal examples the continue head
    # can only learn p=1, dreams never terminate, and terminal rewards
    # (LunarLander/Bipedal +-100) are invisible to imagination — diagnosed
    # round 5 as the remaining terminating-env blocker.  Default False =
    # reference parity (bit-for-bit, for CarRacing-class non-terminating
    # envs).
    next_step_autoreset: bool = False
    crop_rows: int = 84                   # CarRacing dashboard crop (Adaptors.py:35-46)
    max_episode_steps: Optional[int] = None


@dataclass
class RuntimeConfig:
    """TPU/JAX execution knobs (no equivalent in the reference)."""

    compute_dtype: str = "bfloat16"       # matmul/conv compute dtype; 'float32' for parity tests
    use_pallas_gru: bool = False          # fused Pallas GRU cell inside lax.scan
    # Whole-rollout Pallas imagination forward: the H-step dream (actor +
    # GRU + prior + sampling) as ONE grid-over-time kernel with weights
    # VMEM-resident (ops/imagine_pallas); backward stays the deferred-dW XLA
    # scan.  Requires fused_scan_grads and a TPU backend; sampled rollouts
    # are distribution-identical but not bit-equal to the XLA scan.
    use_pallas_imagine: bool = False
    data_axis: str = "data"               # mesh axis names
    model_axis: str = "model"
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, model); None = single device
    checkpoint_dir: str = "./models"
    log_dir: str = "./logs"
    profile: bool = False
    remat_decoder: bool = False           # jax.checkpoint the decoder to save HBM
    # Where the rollout/eval policy runs.  "default" = same device as the
    # learner (co-located TPU); "cpu" = host-local actor with actor/WM params
    # broadcast device->host once per rollout round (the actor-learner split —
    # essential when the accelerator is remote/tunneled, since each env step
    # costs a device round-trip).
    rollout_device: str = "default"
    # Wire dtype of the per-round learner->actor weight broadcast when
    # rollout_device="cpu".  "bfloat16" halves the bytes on the wire (~3x
    # faster over a remote-chip tunnel); the host policy still computes in
    # f32, on bf16-rounded weights.  Default keeps full-precision parity.
    broadcast_dtype: str = "float32"
    debug_nans: bool = False              # jax_debug_nans dev mode (SURVEY §5)
    # Pass the entropy coefficient agent.nu into the fused train program as a
    # TRACED scalar instead of a baked compile-time constant.  Dose changes —
    # the round-4 anti-collapse intervention (docs/evidence/
    # carracer_collapse_diagnosis.md) — then cost a scalar transfer, not a
    # ~20-min recompile: a restart with a different agent.nu override hits
    # the same warm-cache entry, and the orchestrator also polls
    # <log_dir>/nu_override every iteration for LIVE dose changes without a
    # restart.  Off by default so existing configs keep their compiled
    # program hashes (warm-cache compatibility).
    traced_nu: bool = False
    # lax.scan unroll factor for the RSSM time scans (observe/warm-start/
    # imagine).  The scan steps are small (B=50 rows), so per-step while-loop
    # overhead dominates their runtime; unrolling lets XLA fuse across steps.
    # A/B on v5e (tools/ab_fused.py): 5 ≈ 10 > 2 > 1; 5 keeps compiles fast.
    scan_unroll: int = 5
    # Deferred-weight-gradient custom-VJP time scans (ops/fused_scans.py):
    # identical math and RNG stream, but every weight gradient becomes one
    # (T*B)-batched MXU contraction after the backward scan instead of a
    # per-step f32 accumulator in the loop carry (the hottest op in the
    # profile — see PERFORMANCE.md).  Ignored when use_pallas_gru is set.
    fused_scan_grads: bool = True
    async_checkpoint: bool = False        # overlap checkpoint writes with training
    # Include the replay rings in periodic checkpoints.  True gives exact
    # resume (the reference loses its buffer on every restart); False keeps
    # checkpoints to params+optimizer state — on resume the train loop
    # re-primes the buffer with fresh rollouts before updating.  Turn off when
    # the buffer is huge and the chip is remote (a 2.3 GB uint8 ring takes
    # ~13 min per save over a tunnel).
    checkpoint_replay: bool = True
    # Overlap env stepping with the learner update (one-round staleness:
    # rollout i+1 collects under params from iteration i).  Requires
    # rollout_device="cpu" so the actor never reads donated learner buffers.
    async_rollout: bool = False


@dataclass
class DreamerConfig:
    wm: WorldModelConfig = field(default_factory=WorldModelConfig)
    agent: AgentConfig = field(default_factory=AgentConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    env: EnvConfig = field(default_factory=EnvConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)

    # ------------------------------------------------------------------ #
    # Loaders
    # ------------------------------------------------------------------ #

    @classmethod
    def from_yaml(cls, path: str, overrides: Sequence[str] = ()) -> "DreamerConfig":
        with open(path, "r") as f:
            raw = yaml.safe_load(f) or {}
        if _is_flat_reference_config(raw):
            cfg = cls.from_flat_dict(raw)
        else:
            cfg = cls.from_nested_dict(raw)
        for ov in overrides:
            cfg = cfg.with_override(ov)
        return cfg

    @classmethod
    def from_flat_dict(cls, d: Dict[str, Any]) -> "DreamerConfig":
        """Load the reference's flat key schema (car_racer_config.yaml:1-52)."""
        g = d.get
        wm = WorldModelConfig(
            hidden_dim=g("hidden_state_dims", 600),
            latent_rows=tuple(g("latent_state_dims", (32, 32)))[0],
            latent_classes=tuple(g("latent_state_dims", (32, 32)))[1],
            obs_size=tuple(g("observation_dims", (64, 64))),
            encoder_filters_1=g("encoder_filter_num_1", 32),
            encoder_filters_2=g("encoder_filter_num_2", 64),
            encoder_hidden=g("encoder_hidden_layer_nodes", 200),
            decoder_filters_1=g("decoder_filter_num_1", 32),
            decoder_filters_2=g("decoder_filter_num_2", 64),
            decoder_hidden=g("decoder_hidden_layer_nodes", 200),
            dyn_hidden_1=g("dyn_pred_hidden_num_nodes_1", 200),
            dyn_hidden_2=g("dyn_pred_hidden_num_nodes_2", 200),
            rew_hidden_1=g("rew_pred_hidden_num_nodes_1", 200),
            rew_hidden_2=g("rew_pred_hidden_num_nodes_2", 200),
            cont_hidden_1=g("cont_pred_hidden_num_nodes_1", 200),
            cont_hidden_2=g("cont_pred_hidden_num_nodes_2", 200),
            reward_buckets=g("critic_reward_buckets", 255),
            lr=g("world_model_lr", 1e-4),
            betas=tuple(g("world_model_betas", (0.9, 0.999))),
            eps=g("world_model_eps", 1e-5),
            beta_pred=g("beta_prediction", 1.0),
            beta_dyn=g("beta_dynamics", 0.5),
            beta_rep=g("beta_representation", 0.1),
        )
        agent = AgentConfig(
            actor_hidden_1=g("hidden_layer_actor_1_size", 200),
            actor_hidden_2=g("hidden_layer_actor_2_size", 200),
            critic_hidden_1=g("hidden_layer_critic_1_size", 200),
            critic_hidden_2=g("hidden_layer_critic_2_size", 200),
            critic_buckets=g("critic_reward_buckets", 255),
            actor_lr=g("actor_lr", 8e-5),
            actor_betas=tuple(g("actor_betas", (0.9, 0.999))),
            actor_eps=g("actor_eps", 1e-5),
            critic_lr=g("critic_lr", 1e-4),
            critic_betas=tuple(g("critic_betas", (0.9, 0.999))),
            critic_eps=g("critic_eps", 1e-5),
            nu=g("nu", 3e-4),
            lambda_=g("lambda_", 0.95),
            gamma=g("gamma", 0.99),
        )
        train = TrainConfig(
            horizon=g("horizon", 30),
            batch_size=g("batch_size", 50),
            sequence_length=g("sequence_length", 50),
            buffer_size=g("buffer_size", 200_000),
            training_iterations=g("training_iterations", 10_000),
            random_iterations=g("random_iterations", 500),
            wm_epochs=g("WM_epochs", 2),
            ac_epochs=g("AC_epochs", 2),
            seed=g("seed", 42),
        )
        env = EnvConfig(
            env_id=g("env_id", "CarRacing-v3"),
            action_dim=g("action_dims", 3),
        )
        runtime = RuntimeConfig()
        for k, v in d.items():
            if k.startswith("runtime_"):
                setattr(runtime, k[len("runtime_"):], v)
        return cls(wm=wm, agent=agent, train=train, env=env, runtime=runtime)

    @classmethod
    def from_nested_dict(cls, d: Dict[str, Any]) -> "DreamerConfig":
        def build(dc_cls, sub):
            fields = {f.name: f for f in dataclasses.fields(dc_cls)}
            kwargs = {}
            for k, v in (sub or {}).items():
                if k not in fields:
                    raise KeyError(f"Unknown config key {dc_cls.__name__}.{k}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return dc_cls(**kwargs)

        return cls(
            wm=build(WorldModelConfig, d.get("wm")),
            agent=build(AgentConfig, d.get("agent")),
            train=build(TrainConfig, d.get("train")),
            env=build(EnvConfig, d.get("env")),
            runtime=build(RuntimeConfig, d.get("runtime")),
        )

    def with_override(self, dotted: str) -> "DreamerConfig":
        """Apply 'section.key=value' override (value parsed as YAML).

        Coerces by the target field's current type: YAML 1.1 reads bare
        scientific notation like ``3e-3`` as a STRING (it requires ``3.0e-3``),
        which round 4 shipped into a jitted loss as a str and crashed the
        trainer mid-run — numeric-typed fields therefore re-parse string
        values with float()/int() instead of silently storing the str."""
        path, _, value = dotted.partition("=")
        section, _, key = path.partition(".")
        parsed = yaml.safe_load(value)
        if isinstance(parsed, list):
            parsed = tuple(parsed)
        sub = getattr(self, section)
        if not hasattr(sub, key):
            raise KeyError(f"Unknown config key {section}.{key}")
        current = getattr(sub, key)
        if isinstance(parsed, str) and isinstance(current, bool):
            raise ValueError(f"{path}: could not parse {value!r} as bool")
        if isinstance(parsed, str) and isinstance(current, (int, float)):
            try:
                as_float = float(parsed)
            except ValueError:
                raise ValueError(
                    f"{path}: could not parse {value!r} as "
                    f"{type(current).__name__}") from None
            # int-typed fields reject non-integral values instead of silently
            # truncating (e.g. train.eval_every=1.23e1 must not become 12).
            if isinstance(current, bool) is False and isinstance(current, int) \
                    and as_float != int(as_float):
                raise ValueError(
                    f"{path}: {value!r} is not an integer (field is int-typed)")
            parsed = type(current)(as_float)
        if isinstance(parsed, float) and isinstance(current, int) \
                and not isinstance(current, bool):
            # YAML float into an int field (e.g. eval_every=12.3): same rule.
            if parsed != int(parsed):
                raise ValueError(
                    f"{path}: {value!r} is not an integer (field is int-typed)")
            parsed = int(parsed)
        new_sub = dataclasses.replace(sub, **{key: parsed})
        return dataclasses.replace(self, **{section: new_sub})

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _is_flat_reference_config(d: Dict[str, Any]) -> bool:
    nested_keys = {"wm", "agent", "train", "env", "runtime"}
    return not (set(d.keys()) <= nested_keys and any(k in d for k in nested_keys))
