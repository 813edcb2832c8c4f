"""Sparse-autoencoder components: train an SAE on a tapped layer, then audit
its latents like any other component.

Beyond-reference capability (the reference analyzes only native neurons /
conv channels): a sparse autoencoder decomposes a layer's activation space
into many more, sparser, typically more monosemantic directions
("dictionary learning", arXiv:2309.08600; Anthropic's Towards
Monosemanticity). Latent f of the SAE becomes component f of a virtual tap
``"{layer}.sae"`` and flows through the existing Collect → Embed → Analyze
machinery unchanged — top-activating examples, CLIP embeddings, text search,
clarity/polysemanticity scores, CLIP-Dissect naming.

Three SAE flavours (each also available as a TRANSCODER — set ``d_out`` to
train encode-from-``tap_in`` / decode-toward-``tap_out`` dictionaries, the
sparse layer-replacement primitive of circuit analysis, arXiv:2406.11944;
``skip=True`` adds the affine bypass of skip transcoders, arXiv:2501.18823.
:func:`train_transcoder_on_layer` streams positionally-aligned row pairs,
and :class:`TranscoderSubjectModel` both exposes the codes as a virtual
``"{tap_in}.tc"`` tap for the standard pipeline AND patches the target tap
with the transcoder's prediction for fidelity/causal analysis):

- ``k > 0`` — **TopK SAE** (arXiv:2406.04093): keep the k largest
  pre-activations per row, zero the rest; pure MSE objective, sparsity is
  structural. Dead latents are revived with the paper's AuxK loss (the
  top-``aux_k`` *dead* latents must reconstruct the residual).
- ``k == 0`` — **ReLU + L1** SAE: ReLU encoder, ``mse + l1_coef * |z|_1``
  objective with unit-norm decoder rows (gradient projected off the radial
  direction, rows renormalized every step).
- ``jumprelu=True`` — **JumpReLU SAE** (arXiv:2407.14435; the Gemma Scope
  architecture, arXiv:2408.05147): per-latent learned thresholds θ,
  ``z = pre · H(pre − θ)``, trained on ``mse + l0_coef · L0(z)`` with the
  paper's straight-through estimators (rectangle-kernel pseudo-derivatives
  of width ``ste_eps`` for the θ gradient). Published Gemma Scope
  dictionaries load via :func:`load_gemma_scope_params` and audit through
  the standard pipeline.

TPU-native design: the whole optimizer step is one jitted program with the
(params, opt_state, stats) carry **donated**, and the streaming trainer scans
many minibatch steps per dispatch. Activation rows never visit the host —
``train_sae_on_layer`` extracts tap rows and trains on them in the same
device-resident pass over the dataset. Data parallelism: pass a
``jax.sharding.Mesh`` with a ``"data"`` axis; rows shard along it and XLA
inserts the gradient ``psum``.
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from semanticlens_tpu.models.base import SubjectModel

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class SAEConfig:
    """Hyperparameters for SAE init + training.

    d_in : width of the tapped layer (conv channels or token features).
    n_latents : dictionary size (components of the virtual tap).
    k : TopK sparsity; 0 selects the ReLU+L1 objective.
    l1_coef : L1 penalty (ReLU+L1 flavour only).
    aux_k / aux_coef / dead_steps : AuxK dead-latent revival (TopK flavour):
        a latent silent for ``dead_steps`` optimizer steps is dead; the top
        ``aux_k`` dead latents must reconstruct the main residual, weighted
        by ``aux_coef``.
    lr : Adam learning rate.
    batch_rows : activation rows per optimizer step.
    approx_topk : use ``jax.lax.approx_max_k`` for the TRAINING TopK
        selection (TPU PartialReduce; measured on v5e at (4096, 8192) k=32:
        2.5 ms vs 12.0 ms for exact ``lax.top_k`` (4.8×), recall 0.985 —
        a 2.2× whole-step win, 27.3 → 12.6 ms, docs/PERF_NOTES.md).
        Training picks a handful of near-boundary latents differently; the
        objective is unchanged in expectation. Non-TPU backends lower it to
        the exact reduction, so CPU tests are bit-stable. Inference
        (:func:`encode`) always uses the exact top-k so collected evidence
        is deterministic.
    positions_per_image : spatial/token positions sampled per image by the
        streaming trainer (0 = every position). Conv taps at 224² produce
        ~200k floats per image; subsampling decorrelates rows AND bounds
        memory.
    jumprelu / l0_coef / ste_eps / init_theta : JumpReLU flavour
        (requires ``k == 0``): per-latent thresholds ``θ = exp(log_theta)``
        initialised to ``init_theta``, loss ``mse + l0_coef · E[L0]``,
        rectangle-kernel STE bandwidth ``ste_eps`` (arXiv:2407.14435 uses
        0.001 on normalised activations).
    """

    d_in: int
    n_latents: int
    k: int = 32
    l1_coef: float = 1e-3
    aux_k: int = 0
    aux_coef: float = 1.0 / 32.0
    dead_steps: int = 200
    lr: float = 1e-3
    batch_rows: int = 1024
    positions_per_image: int = 0
    approx_topk: bool = True
    jumprelu: bool = False
    l0_coef: float = 6e-4
    ste_eps: float = 1e-3
    init_theta: float = 1e-3
    seed: int = 0
    d_out: int = 0
    skip: bool = False

    def __post_init__(self):
        if self.jumprelu and self.k:
            raise ValueError("jumprelu=True requires k=0 (thresholded, not TopK)")
        if self.skip and not self.d_out:
            raise ValueError("skip=True is a transcoder option; set d_out")

    @property
    def is_transcoder(self) -> bool:
        """``d_out > 0`` selects the transcoder objective: encode from the
        input tap, decode toward a DIFFERENT target tap (arXiv:2406.11944;
        ``skip=True`` adds the affine bypass of skip transcoders,
        arXiv:2501.18823)."""
        return self.d_out > 0


def init_sae(rng, cfg: SAEConfig) -> dict:
    """Decoder rows unit-norm, encoder = decoderᵀ, biases zero — the
    transpose init of arXiv:2406.04093 §A.1 (makes latents approximately
    reconstruct their own direction at step 0). JumpReLU adds per-latent
    ``log_theta`` at ``log(init_theta)``."""
    if cfg.is_transcoder:
        # d_out may differ from d_in, so the transpose init is unavailable:
        # lecun-normal encoder, unit-norm decoder rows, separate input bias
        k_enc, k_dec = jax.random.split(rng)
        w = jax.random.normal(k_dec, (cfg.n_latents, cfg.d_out), jnp.float32)
        params = {
            "W_enc": jax.random.normal(k_enc, (cfg.d_in, cfg.n_latents), jnp.float32)
            / np.sqrt(cfg.d_in),
            "b_enc": jnp.zeros((cfg.n_latents,), jnp.float32),
            "b_in": jnp.zeros((cfg.d_in,), jnp.float32),
            "W_dec": w / jnp.linalg.norm(w, axis=-1, keepdims=True),
            "b_dec": jnp.zeros((cfg.d_out,), jnp.float32),
        }
        if cfg.skip:
            # zero-init: the bypass starts as a no-op and learns the
            # affine component of the target map (arXiv:2501.18823)
            params["W_skip"] = jnp.zeros((cfg.d_in, cfg.d_out), jnp.float32)
        # NOTE: the trainers rescale this init to the DATA once rows are
        # seen (_calibrate_transcoder_init) — input and target taps can
        # differ in scale by orders of magnitude (an MLP output is often
        # ~100× smaller than its LayerNorm'd input), and a unit-scale
        # decoder would start that far from the mean predictor.
    else:
        w = jax.random.normal(rng, (cfg.n_latents, cfg.d_in), jnp.float32)
        w_dec = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
        params = {
            "W_enc": w_dec.T,
            "b_enc": jnp.zeros((cfg.n_latents,), jnp.float32),
            "W_dec": w_dec,
            "b_dec": jnp.zeros((cfg.d_in,), jnp.float32),
        }
    if cfg.jumprelu:
        params["log_theta"] = jnp.full(
            (cfg.n_latents,), float(np.log(cfg.init_theta)), jnp.float32)
    return params


def _topk_mask(pre, k: int):
    """Zero all but the k largest entries of the last axis (ties: lax.top_k
    order). Returns the sparsified codes, ReLU-clamped so early-training
    negative picks cannot inject signed features."""
    vals, idx = jax.lax.top_k(pre, k)
    kth = vals[..., -1:]
    keep = pre >= kth
    return jnp.maximum(pre * keep, 0.0)


def _topk_scatter_approx(pre, k: int):
    """Training-path sparsifier: ``approx_max_k`` + scatter of the ReLU'd
    winners — exactly k candidate slots per row, gradient flows through the
    scattered values. 2-D rows only (the training loss's layout)."""
    vals, idx = jax.lax.approx_max_k(pre, k)
    rows = jnp.arange(pre.shape[0])[:, None]
    return jnp.zeros_like(pre).at[rows, idx].set(jnp.maximum(vals, 0.0))


def _sparsify(pre, k: int, approx: bool):
    if approx and pre.ndim == 2:
        return _topk_scatter_approx(pre, k)
    return _topk_mask(pre, k)


def _rect_kernel(u):
    """Rectangle kernel K(u) = 1{|u| ≤ ½} — the arXiv:2407.14435 default."""
    return (jnp.abs(u) <= 0.5).astype(jnp.float32)


@jax.custom_vjp
def _jumprelu_ste(pre, log_theta, eps):
    theta = jnp.exp(log_theta)
    return pre * (pre > theta)


def _jumprelu_fwd(pre, log_theta, eps):
    return _jumprelu_ste(pre, log_theta, eps), (pre, log_theta, eps)


def _jumprelu_bwd(res, g):
    # STE (arXiv:2407.14435 §3): ∂/∂pre is the true a.e. derivative
    # H(pre−θ); ∂/∂θ uses the kernel pseudo-derivative −(θ/ε)K((pre−θ)/ε),
    # chained with θ = exp(log_theta).
    pre, log_theta, eps = res
    theta = jnp.exp(log_theta)
    d_pre = g * (pre > theta)
    d_theta = g * (-(theta / eps) * _rect_kernel((pre - theta) / eps))
    d_log = (d_theta * theta).reshape(-1, theta.shape[-1]).sum(axis=0)
    return d_pre, d_log, None


_jumprelu_ste.defvjp(_jumprelu_fwd, _jumprelu_bwd)


@jax.custom_vjp
def _l0_ste(pre, log_theta, eps):
    theta = jnp.exp(log_theta)
    return (pre > theta).astype(jnp.float32)


def _l0_fwd(pre, log_theta, eps):
    return _l0_ste(pre, log_theta, eps), (pre, log_theta, eps)


def _l0_bwd(res, g):
    # H(pre−θ) is flat a.e. in pre (gradient 0); θ gets the kernel
    # pseudo-derivative −(1/ε)K((pre−θ)/ε) — this is the ONLY pathway that
    # teaches thresholds to rise and kill marginal firings.
    pre, log_theta, eps = res
    theta = jnp.exp(log_theta)
    d_theta = g * (-(1.0 / eps) * _rect_kernel((pre - theta) / eps))
    d_log = (d_theta * theta).reshape(-1, theta.shape[-1]).sum(axis=0)
    return jnp.zeros_like(pre), d_log, None


_l0_ste.defvjp(_l0_fwd, _l0_bwd)


def encode(params: Mapping, x, k: int = 0):
    """Rows (..., d_in) → codes (..., n_latents); TopK when ``k > 0``;
    JumpReLU (``pre · H(pre − exp(log_theta))``) when the dictionary
    carries per-latent thresholds. Transcoder dictionaries carry a separate
    input bias ``b_in`` (their ``b_dec`` lives in the OUTPUT space)."""
    b_in = params["b_in"] if "b_in" in params else params["b_dec"]
    pre = (x.astype(jnp.float32) - b_in) @ params["W_enc"] + params["b_enc"]
    if k > 0:
        return _topk_mask(pre, k)
    if "log_theta" in params:
        return pre * (pre > jnp.exp(params["log_theta"]))
    return jax.nn.relu(pre)


def decode(params: Mapping, z, x=None):
    """Codes → reconstruction. A skip-transcoder dictionary additionally
    needs the original input rows ``x`` for its affine bypass."""
    out = z @ params["W_dec"] + params["b_dec"]
    if "W_skip" in params:
        if x is None:
            raise ValueError("skip-transcoder decode needs the input rows x")
        out = out + x.astype(jnp.float32) @ params["W_skip"]
    return out


def finalize_sae_params(params: Mapping, cfg: SAEConfig) -> dict:
    """Stamp the encode-time sparsity into the trained artifact.

    A TopK dictionary only makes sense encoded with the ``k`` it was trained
    for; storing it with the weights makes the artifact self-describing, so
    :class:`SAESubjectModel` cannot silently fall back to a dense ReLU
    encoder. ``encode``/``decode`` ignore the entry; the training entry
    points strip it before differentiating.
    """
    return {**{n: v for n, v in params.items() if n != "k"},
            "k": jnp.asarray(cfg.k, jnp.int32)}


def load_gemma_scope_params(arrays: Mapping) -> dict:
    """Convert a published Gemma Scope dictionary (arXiv:2408.05147) to this
    module's parameter convention.

    Gemma Scope stores ``W_enc (d_in, n_latents)``, ``b_enc``, ``W_dec
    (n_latents, d_in)``, ``b_dec``, ``threshold (n_latents,)`` and encodes
    WITHOUT input centering: ``pre = x @ W_enc + b_enc``. This module's
    :func:`encode` centers by ``b_dec`` first, so the loader FOLDS the
    centering into the encoder bias — ``b_enc' = b_enc + b_dec @ W_enc`` —
    making ``encode`` numerically equivalent to the published convention
    (within float32 rounding — the fold reassociates the bias sum; tested
    to tolerance).
    Thresholds become ``log_theta`` (JumpReLU dispatch); non-positive
    thresholds are clamped to a tiny positive ε so the log is finite (a
    θ ≤ 0 latent fires on every positive pre-activation either way).
    The returned dict carries ``k = 0``.
    """
    w_enc = jnp.asarray(arrays["W_enc"], jnp.float32)
    b_enc = jnp.asarray(arrays["b_enc"], jnp.float32)
    w_dec = jnp.asarray(arrays["W_dec"], jnp.float32)
    b_dec = jnp.asarray(arrays["b_dec"], jnp.float32)
    theta = jnp.asarray(arrays["threshold"], jnp.float32)
    if w_enc.shape != w_dec.shape[::-1]:
        raise ValueError(
            f"W_enc {tuple(w_enc.shape)} is not W_dec {tuple(w_dec.shape)} transposed")
    return {
        "W_enc": w_enc,
        "b_enc": b_enc + b_dec @ w_enc,
        "W_dec": w_dec,
        "b_dec": b_dec,
        "log_theta": jnp.log(jnp.maximum(theta, 1e-12)),
        "k": jnp.asarray(0, jnp.int32),
    }


def init_stats(cfg: SAEConfig) -> dict:
    """Per-latent liveness tracking carried through training (int32 so the
    donated carry stays fixed-dtype): steps since each latent last fired."""
    return {
        "last_fired": jnp.zeros((cfg.n_latents,), jnp.int32),
        "step": jnp.zeros((), jnp.int32),
    }


def _loss_fn(params, x, cfg: SAEConfig, last_fired, y=None):
    x = x.astype(jnp.float32)
    target = x if y is None else y.astype(jnp.float32)
    b_in = params["b_in"] if "b_in" in params else params["b_dec"]
    pre = (x - b_in) @ params["W_enc"] + params["b_enc"]
    if cfg.jumprelu:
        z = _jumprelu_ste(pre, params["log_theta"], cfg.ste_eps)
    else:
        z = _sparsify(pre, cfg.k, cfg.approx_topk) if cfg.k > 0 else jax.nn.relu(pre)
    recon = decode(params, z, x if "W_skip" in params else None)
    err = recon - target
    mse = jnp.mean(jnp.sum(err * err, axis=-1))
    loss = mse
    if cfg.jumprelu:
        # Expected L0 per row; the STE's θ pseudo-gradient is the only
        # signal pushing thresholds up (arXiv:2407.14435 eq. 9-11).
        loss = loss + cfg.l0_coef * jnp.mean(
            jnp.sum(_l0_ste(pre, params["log_theta"], cfg.ste_eps), axis=-1))
    if cfg.k > 0 and cfg.aux_k > 0:
        # AuxK (arXiv:2406.04093 §A.2): top aux_k DEAD latents reconstruct
        # the main residual; gradients flow only through dead latents.
        dead = last_fired >= cfg.dead_steps
        pre_dead = jnp.where(dead, pre, -jnp.inf)
        # Exact top-k here: at aux_k=256 approx_max_k measured only 1.14×
        # faster on v5e (24.9 vs 22.0 ms, docs/PERF_NOTES.md) — not worth
        # the recall loss on the dead-revival path, which fires rarely.
        z_aux = _topk_mask(pre_dead, min(cfg.aux_k, cfg.n_latents))
        z_aux = jnp.where(jnp.isfinite(z_aux), z_aux, 0.0)
        recon_aux = z_aux @ params["W_dec"]
        aux_err = recon_aux - jax.lax.stop_gradient(-err)
        aux = jnp.mean(jnp.sum(aux_err * aux_err, axis=-1))
        # With no dead latents z_aux ≡ 0 and aux degrades to ‖err‖² — a
        # constant w.r.t. the dead path but not w.r.t. the main one; gate it.
        loss = loss + cfg.aux_coef * jnp.where(dead.any(), aux, 0.0)
    if cfg.k == 0 and not cfg.jumprelu:
        # Norm-weighted L1 (decoder rows are unit-norm by projection, but
        # weighting keeps the objective well-defined between renorms).
        row_norm = jnp.linalg.norm(params["W_dec"], axis=-1)
        loss = loss + cfg.l1_coef * jnp.mean(jnp.sum(z * row_norm, axis=-1))
    fired = jnp.any(z > 0.0, axis=tuple(range(z.ndim - 1)))
    var = jnp.sum((target - jnp.mean(target, axis=0)) ** 2)
    aux_metrics = {
        "mse": mse,
        "fvu": jnp.sum(err * err) / jnp.maximum(var, 1e-9),
        "l0": jnp.mean(jnp.sum(z > 0.0, axis=-1).astype(jnp.float32)),
    }
    return loss, (fired, aux_metrics)


def _project_decoder(params, grads):
    """Remove the gradient component parallel to each decoder row so the
    optimizer cannot shrink the L1 penalty by scaling rows (ReLU+L1 only)."""
    w = params["W_dec"]
    unit = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-9)
    g = grads["W_dec"]
    grads = dict(grads)
    grads["W_dec"] = g - jnp.sum(g * unit, axis=-1, keepdims=True) * unit
    return grads


def _renorm_decoder(params):
    w = params["W_dec"]
    return {**params, "W_dec": w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-9)}


def make_optimizer(cfg: SAEConfig):
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(cfg.lr))


def make_train_step(cfg: SAEConfig, optimizer=None, *, paired: bool = False):
    """One optimizer step: ``step(params, opt_state, stats, x_rows)`` →
    updated triple + scalar metrics (``paired=True`` adds a ``y_rows``
    argument — the transcoder target). Pure — callers jit it (alone or
    inside a scan) with the carry donated."""
    optimizer = optimizer or make_optimizer(cfg)

    def _update(params, opt_state, stats, x, y):
        (loss, (fired, metrics)), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(params, x, cfg, stats["last_fired"], y)
        # Unit-norm decoder constraint is the ReLU+L1 anti-scale-gaming
        # device; L0 is scale-invariant so JumpReLU trains unconstrained
        # (arXiv:2407.14435 trains W_dec freely). Transcoders also train
        # W_dec freely: renorming to unit rows on step 1 would undo
        # _calibrate_transcoder_init's y_std decoder scaling (input and
        # target taps can differ in scale by orders of magnitude), and the
        # norm-weighted L1 in _loss_fn (z·‖W_dec row‖) already makes the
        # penalty invariant to the shrink-z/grow-rows gaming the constraint
        # exists to stop.
        constrain_dec = cfg.k == 0 and not cfg.jumprelu and not cfg.is_transcoder
        if constrain_dec:
            grads = _project_decoder(params, grads)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if constrain_dec:
            params = _renorm_decoder(params)
        stats = {
            "last_fired": jnp.where(fired, 0, stats["last_fired"] + 1),
            "step": stats["step"] + 1,
        }
        return params, opt_state, stats, {"loss": loss, **metrics}

    if paired:
        def step(params, opt_state, stats, x, y):
            return _update(params, opt_state, stats, x, y)
    else:
        def step(params, opt_state, stats, x):
            return _update(params, opt_state, stats, x, None)

    return step


def _scan_steps(cfg: SAEConfig, optimizer, paired: bool = False):
    """Jitted: run one optimizer step per leading-axis minibatch of
    ``batches`` (S, batch_rows, d_in) — or per ``(x, y)`` minibatch pair
    when ``paired`` — carry donated in place in HBM."""
    step = make_train_step(cfg, optimizer, paired=paired)

    def run(params, opt_state, stats, batches):
        def body(carry, xy):
            params, opt_state, stats = carry
            args = xy if paired else (xy,)
            params, opt_state, stats, metrics = step(params, opt_state, stats, *args)
            return (params, opt_state, stats), metrics

        (params, opt_state, stats), metrics = jax.lax.scan(
            body, (params, opt_state, stats), batches
        )
        return params, opt_state, stats, jax.tree.map(lambda m: m[-1], metrics)

    return jax.jit(run, donate_argnums=(0, 1, 2))


def train_sae_from_rows(
    rows,
    cfg: SAEConfig,
    *,
    targets=None,
    steps: int = 1000,
    mesh=None,
    params: dict | None = None,
    log_every: int = 0,
):
    """Train on a fixed (N, d_in) row matrix (already-extracted activations).

    Rows live on device once; each dispatch scans a chunk of optimizer steps
    over epoch-permuted minibatches (chained shuffles — every row is visited
    once per epoch-equivalent). With ``mesh`` (a ``"data"`` axis),
    minibatches shard row-wise and XLA all-reduces the gradients — the math
    is identical to single-device (tested).

    Returns ``(params, stats, metrics)`` — metrics from the final step. The
    returned params carry a ``"k"`` entry recording the encode-time sparsity
    the dictionary was trained for (see :func:`finalize_sae_params`).
    """
    rows = jnp.asarray(rows, jnp.float32)
    n = rows.shape[0]
    if rows.ndim != 2 or rows.shape[1] != cfg.d_in:
        raise ValueError(f"rows must be (N, {cfg.d_in}), got {tuple(rows.shape)}")
    if n < cfg.batch_rows:
        raise ValueError(f"need at least batch_rows={cfg.batch_rows} rows, got {n}")
    paired = targets is not None
    if cfg.is_transcoder != paired:
        raise ValueError(
            "transcoder configs (d_out > 0) train on (rows, targets) pairs; "
            "plain SAE configs take rows only"
        )
    if paired:
        targets = jnp.asarray(targets, jnp.float32)
        if targets.shape != (n, cfg.d_out):
            raise ValueError(
                f"targets must be (N={n}, d_out={cfg.d_out}), got {tuple(targets.shape)}"
            )
    key = jax.random.PRNGKey(cfg.seed)
    if params is None:
        key, sub = jax.random.split(key)
        params = init_sae(sub, cfg)
        if paired:
            params = _calibrate_transcoder_init(params, rows, targets)
    else:
        params = {name: v for name, v in params.items() if name != "k"}
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    stats = init_stats(cfg)
    runner = _scan_steps(cfg, optimizer, paired=paired)

    if mesh is not None:
        batch_sharding = NamedSharding(mesh, P(None, "data"))
        rows = jax.device_put(rows, NamedSharding(mesh, P()))
        if paired:
            targets = jax.device_put(targets, NamedSharding(mesh, P()))

    rng = np.random.default_rng(cfg.seed)
    # Epoch-style sampling: indices come from chained host-side permutations,
    # so every row is visited once per ceil(n / batch_rows) steps (i.i.d.
    # draws would leave ~1/e of the rows unseen per epoch-equivalent).
    perm = rng.permutation(n)
    pos = 0

    def _take(count: int) -> np.ndarray:
        nonlocal perm, pos
        out = np.empty(count, np.int64)
        filled = 0
        while filled < count:
            avail = min(count - filled, n - pos)
            out[filled : filled + avail] = perm[pos : pos + avail]
            pos += avail
            filled += avail
            if pos == n:
                perm = rng.permutation(n)
                pos = 0
        return out

    chunk = max(1, min(steps, 32))
    done = 0
    metrics = {}
    while done < steps:
        s = min(chunk, steps - done)
        # Host-side permutation indices; the gather happens on device.
        idx = _take(s * cfg.batch_rows).reshape(s, cfg.batch_rows)
        idx = jnp.asarray(idx)
        batches = (rows[idx], targets[idx]) if paired else rows[idx]
        if mesh is not None:
            batches = jax.tree.map(lambda b: jax.device_put(b, batch_sharding), batches)
        params, opt_state, stats, metrics = runner(params, opt_state, stats, batches)
        done += s
        if log_every and (done % log_every < chunk):
            m = jax.device_get(metrics)
            logger.info(
                "sae step %d: loss %.4g fvu %.3f l0 %.1f", done, m["loss"], m["fvu"], m["l0"]
            )
    return finalize_sae_params(params, cfg), stats, jax.device_get(metrics)


def _calibrate_transcoder_init(params: dict, x_rows, y_rows) -> dict:
    """Data-dependent transcoder init: center the encoder on the input mean,
    start the decoder bias at the target mean, and scale the unit-norm
    decoder rows to the target's standard deviation — the mean predictor is
    the starting point regardless of how far apart the two taps' scales are
    (the standard b_dec-to-mean initialization of SAE practice, applied to
    the transcoder's output space)."""
    x = jnp.asarray(x_rows, jnp.float32)
    y = jnp.asarray(y_rows, jnp.float32)
    y_std = jnp.maximum(jnp.std(y), 1e-8)
    return {
        **params,
        "b_in": jnp.mean(x, axis=0),
        "b_dec": jnp.mean(y, axis=0),
        "W_dec": params["W_dec"] * y_std,
    }


def train_transcoder_from_rows(rows, targets, cfg: SAEConfig, **kwargs):
    """Train a transcoder on paired (input-tap, target-tap) row matrices.

    A transcoder (arXiv:2406.11944) is an SAE whose decoder reconstructs a
    DIFFERENT activation than the encoder reads — canonically the MLP's
    output from the MLP's input — so its latents form a sparse, interpretable
    replacement of the layer's computation (the building block of
    attribution-graph circuit analysis). ``cfg.skip=True`` adds the
    zero-initialized affine bypass of skip transcoders (arXiv:2501.18823),
    which absorbs the map's linear component so latents spend their capacity
    on the nonlinear part. Same flavours/machinery as
    :func:`train_sae_from_rows` (TopK/AuxK, ReLU+L1, JumpReLU, mesh DP,
    donated scanned steps); requires ``cfg.d_out`` = target width.
    """
    return train_sae_from_rows(rows, cfg, targets=targets, **kwargs)


def _make_pair_extractor(model: SubjectModel, tap_in: str, tap_out: str, cfg: SAEConfig):
    """Jitted (params, images, key) → (x_rows, y_rows) from ONE forward:
    the same sampled positions index both taps, keeping pairs aligned."""

    @jax.jit
    def extract(params, images, key):
        _, taps = model.apply(params, images, (tap_in, tap_out))
        hx = taps[tap_in].astype(jnp.float32)
        hy = taps[tap_out].astype(jnp.float32)
        b = hx.shape[0]
        fx = hx.reshape(b, -1, hx.shape[-1])
        fy = hy.reshape(b, -1, hy.shape[-1])
        if fx.shape[1] != fy.shape[1]:
            raise ValueError(
                f"taps '{tap_in}' and '{tap_out}' have different position counts "
                f"({fx.shape[1]} vs {fy.shape[1]}); a transcoder needs positionally "
                "aligned input/target activations"
            )
        if cfg.positions_per_image and cfg.positions_per_image < fx.shape[1]:
            pos = jax.random.randint(
                key, (b, cfg.positions_per_image), 0, fx.shape[1], jnp.int32
            )
            fx = jnp.take_along_axis(fx, pos[..., None], axis=1)
            fy = jnp.take_along_axis(fy, pos[..., None], axis=1)
        return fx.reshape(-1, fx.shape[-1]), fy.reshape(-1, fy.shape[-1])

    return extract


def train_transcoder_on_layer(
    model: SubjectModel,
    params,
    dataset,
    tap_in: str,
    tap_out: str,
    cfg: SAEConfig,
    *,
    batch_size: int = 64,
    epochs: int = 1,
    mesh=None,
    input_preprocess=None,
    log_every: int = 0,
):
    """Streaming transcoder trainer: one device-resident pass (per epoch)
    over the dataset, extracting positionally-aligned (``tap_in``,
    ``tap_out``) row pairs from a single subject forward and scanning
    optimizer minibatches — the transcoder sibling of
    :func:`train_sae_on_layer` (same static-shape/batch semantics).
    """
    from semanticlens_tpu.data.dataset import device_prefetch_batches, iter_batches

    if not cfg.is_transcoder:
        raise ValueError("set cfg.d_out to the target tap's width")
    if cfg.d_in <= 0:
        raise ValueError("cfg.d_in must be set to the input tap's width")
    prep = input_preprocess or (lambda x: x.astype(jnp.float32))
    wrapped = _PreprocessedModel(model, prep)
    extract = _make_pair_extractor(wrapped, tap_in, tap_out, cfg)

    key = jax.random.PRNGKey(cfg.seed)
    key, sub = jax.random.split(key)
    tc_params = init_sae(sub, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = None  # initialized after data-dependent calibration below
    stats = init_stats(cfg)
    runner = _scan_steps(cfg, optimizer, paired=True)

    sharding = NamedSharding(mesh, P("data")) if mesh is not None else None
    n_full = (len(dataset) // batch_size) * batch_size
    if n_full == 0:
        raise ValueError(f"dataset of {len(dataset)} samples < batch_size {batch_size}")

    done_steps = 0
    metrics = {}
    for epoch in range(epochs):
        batches = device_prefetch_batches(
            iter_batches(dataset, batch_size), sharding=sharding
        )
        for images, start_index, _ in batches:
            if start_index + batch_size > len(dataset):
                continue  # zero-padded tail batch: skip (static-shape training)
            key, k1, k2 = jax.random.split(key, 3)
            xr, yr = extract(params, images, k1)
            n_rows = xr.shape[0]
            if n_rows < cfg.batch_rows:
                raise ValueError(
                    f"batch yields {n_rows} rows < batch_rows={cfg.batch_rows}; "
                    "raise batch_size or positions_per_image"
                )
            if opt_state is None:
                tc_params = _calibrate_transcoder_init(tc_params, xr, yr)
                opt_state = optimizer.init(tc_params)
            perm = jax.random.permutation(k2, n_rows)
            s = n_rows // cfg.batch_rows
            sel = perm[: s * cfg.batch_rows]
            mini = (
                xr[sel].reshape(s, cfg.batch_rows, cfg.d_in),
                yr[sel].reshape(s, cfg.batch_rows, cfg.d_out),
            )
            if sharding is not None:
                mini = jax.tree.map(
                    lambda b: jax.device_put(b, NamedSharding(mesh, P(None, "data"))), mini
                )
            tc_params, opt_state, stats, metrics = runner(tc_params, opt_state, stats, mini)
            done_steps += s
            if log_every and done_steps % log_every < s:
                m = jax.device_get(metrics)
                logger.info(
                    "transcoder epoch %d step %d: loss %.4g fvu %.3f l0 %.1f",
                    epoch, done_steps, m["loss"], m["fvu"], m["l0"],
                )
    return finalize_sae_params(tc_params, cfg), stats, jax.device_get(metrics)


def _make_row_extractor(model: SubjectModel, layer_name: str, cfg: SAEConfig):
    """Jitted (params, images, key) → (rows, d_in-wide f32), flattening all
    leading/spatial axes; optionally subsampling positions per image."""

    @jax.jit
    def extract(params, images, key):
        _, taps = model.apply(params, images, (layer_name,))
        h = taps[layer_name].astype(jnp.float32)
        b = h.shape[0]
        flat = h.reshape(b, -1, h.shape[-1])  # (B, positions, d_in)
        if cfg.positions_per_image and cfg.positions_per_image < flat.shape[1]:
            pos = jax.random.randint(
                key, (b, cfg.positions_per_image), 0, flat.shape[1], jnp.int32
            )
            flat = jnp.take_along_axis(flat, pos[..., None], axis=1)
        return flat.reshape(-1, flat.shape[-1])

    return extract


def train_sae_on_layer(
    model: SubjectModel,
    params,
    dataset,
    layer_name: str,
    cfg: SAEConfig,
    *,
    batch_size: int = 64,
    epochs: int = 1,
    mesh=None,
    input_preprocess=None,
    log_every: int = 0,
):
    """Streaming trainer: one device-resident pass (per epoch) over the
    dataset — extract the tap's activation rows, shuffle, and scan optimizer
    minibatches, without the rows ever visiting the host.

    The last partial image batch is dropped (static shapes; an epoch's worth
    of rows dwarfs one batch). Row order follows the dataset within a pass;
    ``positions_per_image`` subsampling provides the decorrelation.

    Returns ``(sae_params, stats, metrics)``; the params carry a ``"k"``
    entry recording the encode-time sparsity (:func:`finalize_sae_params`).
    """
    from semanticlens_tpu.data.dataset import device_prefetch_batches, iter_batches

    if cfg.d_in <= 0:
        raise ValueError("cfg.d_in must be set to the tapped layer's width")
    prep = input_preprocess or (lambda x: x.astype(jnp.float32))
    wrapped = _PreprocessedModel(model, prep)
    extract = _make_row_extractor(wrapped, layer_name, cfg)

    key = jax.random.PRNGKey(cfg.seed)
    key, sub = jax.random.split(key)
    sae_params = init_sae(sub, cfg)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(sae_params)
    stats = init_stats(cfg)
    runner = _scan_steps(cfg, optimizer)

    sharding = NamedSharding(mesh, P("data")) if mesh is not None else None
    n_full = (len(dataset) // batch_size) * batch_size
    if n_full == 0:
        raise ValueError(f"dataset of {len(dataset)} samples < batch_size {batch_size}")

    done_steps = 0
    metrics = {}
    for epoch in range(epochs):
        batches = device_prefetch_batches(
            iter_batches(dataset, batch_size), sharding=sharding
        )
        for images, start_index, _ in batches:
            if start_index + batch_size > len(dataset):
                continue  # zero-padded tail batch: skip (static-shape training)
            key, k1, k2 = jax.random.split(key, 3)
            rows = extract(params, images, k1)
            n_rows = rows.shape[0]
            if n_rows < cfg.batch_rows:
                raise ValueError(
                    f"batch yields {n_rows} rows < batch_rows={cfg.batch_rows}; "
                    "raise batch_size or positions_per_image"
                )
            perm = jax.random.permutation(k2, n_rows)
            s = n_rows // cfg.batch_rows
            mini = rows[perm[: s * cfg.batch_rows]].reshape(s, cfg.batch_rows, cfg.d_in)
            if sharding is not None:
                mini = jax.device_put(mini, NamedSharding(mesh, P(None, "data")))
            sae_params, opt_state, stats, metrics = runner(sae_params, opt_state, stats, mini)
            done_steps += s
            if log_every and done_steps % log_every < s:
                m = jax.device_get(metrics)
                logger.info(
                    "sae epoch %d step %d: loss %.4g fvu %.3f l0 %.1f",
                    epoch, done_steps, m["loss"], m["fvu"], m["l0"],
                )
    return finalize_sae_params(sae_params, cfg), stats, jax.device_get(metrics)


class _PreprocessedModel(SubjectModel):
    """Compose an input_preprocess fn in front of a subject model (engine
    parity for the row extractor)."""

    def __init__(self, base: SubjectModel, prep):
        self.base = base
        self.prep = prep
        self.module_names = tuple(base.module_names)

    def apply(self, params, x, tap_names=()):
        return self.base.apply(params, self.prep(x), tap_names)


class SAESubjectModel(SubjectModel):
    """Subject model exposing a trained SAE's codes as a virtual tap.

    Wraps a base model and adds ``"{layer}.sae"`` to ``module_names``: its
    activation is the SAE code field with the layer's spatial/token structure
    preserved — (B, H, W, n_latents) for conv taps, (B, T, n_latents) for
    transformer taps — so every existing aggregator applies. Base taps stay
    available through the wrapper.

    ``params`` is ``{"base": base_params, "sae": sae_params}``.
    """

    def __init__(
        self,
        base: SubjectModel,
        layer_name: str,
        sae_params: Mapping,
        *,
        k: int | None = None,
        base_params=None,
        name: str | None = None,
    ):
        if not base.has_module(layer_name):
            raise ValueError(f"Layer '{layer_name}' not found in model.")
        self.base = base
        self.layer_name = layer_name
        stored_k = sae_params.get("k")
        if k is None:
            if stored_k is None:
                raise ValueError(
                    "Encode-time sparsity unknown: sae_params carries no 'k' "
                    "entry and none was passed. A TopK-trained dictionary "
                    "encoded densely (k=0) collects evidence on a code "
                    "distribution it was never trained for — pass k= "
                    "explicitly, or train via semanticlens_tpu.sae (whose "
                    "trainers stamp 'k' into the params)."
                )
            k = int(stored_k)
        elif stored_k is not None and int(stored_k) != int(k):
            raise ValueError(
                f"k={int(k)} contradicts the sparsity the dictionary was "
                f"trained for (sae_params['k']={int(stored_k)})."
            )
        self.k = int(k)
        self.sae_tap = f"{layer_name}.sae"
        self.module_names = tuple(base.module_names) + (self.sae_tap,)
        base_params = base_params if base_params is not None else getattr(base, "params", None)
        if base_params is not None:
            self.params = {"base": base_params, "sae": dict(sae_params)}
        self._sae_params = dict(sae_params)
        if name is None:
            base_name = getattr(base, "name", base.__class__.__name__)
            n_latents = int(np.shape(sae_params["W_dec"])[0])
            digest = _params_digest(sae_params)
            name = f"{base_name}-sae_{layer_name}_{n_latents}k{self.k}_{digest}"
        self.name = name

    def init(self, rng):
        return {"base": self.base.init(rng), "sae": self._sae_params}

    def apply(self, params, x, tap_names=()):
        from semanticlens_tpu.models.base import (
            apply_interventions,
            has_intervention,
            interventions,
        )

        tap_names = tuple(tap_names)
        want_sae = self.sae_tap in tap_names
        base_taps = tuple(t for t in tap_names if t != self.sae_tap)
        if has_intervention(self.sae_tap):
            # Causal path: an SAE latent never feeds the forward directly,
            # so rewriting the "{layer}.sae" tap substitutes the layer's
            # activation with encode → rewrite → decode (the same semantics
            # as causal.sae_latent_ablation — the baseline includes the
            # SAE's reconstruction error; compare against an identity
            # rewrite, not the raw forward, to isolate the latent effect).
            if "b_in" in params["sae"]:
                raise ValueError(
                    "this dictionary is a transcoder (decodes into a "
                    "DIFFERENT tap's space); in-place substitution of "
                    f"'{self.layer_name}' would be dimensionally wrong — "
                    "use TranscoderSubjectModel, which replaces the target "
                    "tap instead"
                )
            stash = {}

            def _substitute(v):
                z = apply_interventions(
                    self.sae_tap, encode(params["sae"], v, k=self.k))
                stash["codes"] = z
                return decode(params["sae"], z).astype(v.dtype)

            with interventions({self.layer_name: _substitute}):
                out, taps = self.base.apply(params["base"], x, base_taps)
            if want_sae:
                taps[self.sae_tap] = stash["codes"]
            return out, taps
        need = base_taps if not want_sae else tuple(dict.fromkeys(base_taps + (self.layer_name,)))
        out, taps = self.base.apply(params["base"], x, need)
        if want_sae:
            codes = encode(params["sae"], taps[self.layer_name], k=self.k)
            if self.layer_name not in base_taps:
                del taps[self.layer_name]
            taps[self.sae_tap] = codes
        return out, taps


class TranscoderSubjectModel(SubjectModel):
    """Subject model exposing a trained transcoder's codes as a virtual tap.

    Adds ``"{tap_in}.tc"`` to ``module_names``: its activation is the
    transcoder code field (same spatial/token structure as the input tap),
    so transcoder latents collect evidence / embed / score / get named
    through the standard pipeline exactly like SAE latents.

    Causal semantics differ from :class:`SAESubjectModel`: a transcoder
    predicts a DIFFERENT tap, so when the virtual tap carries an
    intervention — or when ``replace=True`` — the TARGET tap's activation is
    substituted with ``decode(rewrite(encode(tap_in)))`` (the
    MLP-replacement patch of transcoder circuit analysis, arXiv:2406.11944;
    ``replace=True`` with an identity rewrite measures the transcoder's
    patched-model fidelity).

    ``params`` is ``{"base": base_params, "tc": transcoder_params}``.
    """

    def __init__(
        self,
        base: SubjectModel,
        tap_in: str,
        tap_out: str,
        tc_params: Mapping,
        *,
        k: int | None = None,
        base_params=None,
        replace: bool = False,
        name: str | None = None,
    ):
        for tap in (tap_in, tap_out):
            if not base.has_module(tap):
                raise ValueError(f"Layer '{tap}' not found in model.")
        if tap_in == tap_out:
            # the patch path builds {tap_in: capture, tap_out: substitute} —
            # equal keys would silently drop the capture and fail at trace
            # time with an opaque KeyError('codes'); an in-place dictionary
            # is SAESubjectModel's job
            raise ValueError(
                "tap_in == tap_out is not a transcoder (it predicts a "
                "DIFFERENT tap); use SAESubjectModel for in-place dictionaries"
            )
        if "b_in" not in tc_params:
            raise ValueError(
                "tc_params is a plain SAE dictionary (no 'b_in'); train via "
                "train_transcoder_on_layer / train_transcoder_from_rows"
            )
        self.base = base
        self.tap_in = tap_in
        self.tap_out = tap_out
        self.replace = bool(replace)
        stored_k = tc_params.get("k")
        if k is None:
            if stored_k is None:
                raise ValueError("pass k= or train via semanticlens_tpu.sae "
                                 "(trainers stamp 'k' into the params)")
            k = int(stored_k)
        elif stored_k is not None and int(stored_k) != int(k):
            raise ValueError(
                f"k={int(k)} contradicts tc_params['k']={int(stored_k)}")
        self.k = int(k)
        self.tc_tap = f"{tap_in}.tc"
        self.module_names = tuple(base.module_names) + (self.tc_tap,)
        base_params = base_params if base_params is not None else getattr(base, "params", None)
        if base_params is not None:
            self.params = {"base": base_params, "tc": dict(tc_params)}
        self._tc_params = dict(tc_params)
        if name is None:
            base_name = getattr(base, "name", base.__class__.__name__)
            n_latents = int(np.shape(tc_params["W_dec"])[0])
            digest = _params_digest(tc_params)
            name = f"{base_name}-tc_{tap_in}_{n_latents}k{self.k}_{digest}"
        self.name = name

    def init(self, rng):
        return {"base": self.base.init(rng), "tc": self._tc_params}

    def apply(self, params, x, tap_names=()):
        from semanticlens_tpu.models.base import (
            apply_interventions,
            has_intervention,
            interventions,
        )

        tap_names = tuple(tap_names)
        want_tc = self.tc_tap in tap_names
        base_taps = tuple(t for t in tap_names if t != self.tc_tap)
        if self.replace or has_intervention(self.tc_tap):
            # Patch path: capture tap_in in flight, rewrite its codes, and
            # substitute the transcoder's prediction for tap_out. tap_in
            # precedes tap_out in the forward, so its stash is ready.
            stash = {}

            def _capture(v):
                z = apply_interventions(self.tc_tap, encode(params["tc"], v, k=self.k))
                stash["codes"], stash["x"] = z, v
                return v

            def _substitute(v):
                return decode(params["tc"], stash["codes"], stash["x"]
                              if "W_skip" in params["tc"] else None).astype(v.dtype)

            with interventions({self.tap_in: _capture, self.tap_out: _substitute}):
                out, taps = self.base.apply(params["base"], x, base_taps)
            if want_tc:
                taps[self.tc_tap] = stash["codes"]
            return out, taps
        need = base_taps if not want_tc else tuple(dict.fromkeys(base_taps + (self.tap_in,)))
        out, taps = self.base.apply(params["base"], x, need)
        if want_tc:
            codes = encode(params["tc"], taps[self.tap_in], k=self.k)
            if self.tap_in not in base_taps:
                del taps[self.tap_in]
            taps[self.tc_tap] = codes
        return out, taps


def _params_digest(sae_params: Mapping, n: int = 8) -> str:
    """Short content hash of the decoder so cache identity follows the
    trained dictionary (a retrained SAE must not hit a stale cache)."""
    import hashlib

    w = np.ascontiguousarray(np.asarray(sae_params["W_dec"], np.float32))
    return hashlib.sha256(w.tobytes()).hexdigest()[:n]
