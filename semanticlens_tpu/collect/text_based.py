"""Text-modality Collect+Embed: dissect language models with the same pipeline.

Beyond-reference capability (the reference is vision-only, reference
README.md:4): components of a transformer LM (MLP neurons, attention
channels — any tap of :class:`semanticlens_tpu.models.gpt.GPT2` or a custom
text subject) are audited with the unchanged Collect→Embed→Analyze
machinery. The only modality-specific piece is the Embed stage: evidence
samples are STRINGS, embedded by the foundation model's text tower
(``fm.tokenize`` → ``fm.encode_text``) instead of the vision tower. The
resulting concept DB lives in the same joint space, so text probing,
CLIP-Dissect naming, clarity/redundancy/polysemanticity, drift audits, and
causal validation all apply verbatim.

Usage sketch::

    lm = GPT2(...); lm.params = ...; lm.name = "gpt2"
    tokens = TokenTextDataset(token_rows, texts, name="prompts")
    cv = TextActivationComponentVisualizer(
        model=lm, dataset_model=tokens, dataset_fm=tokens.texts_view(),
        layer_names=["transformer.h.3.mlp.act"], num_samples=9,
        cache_dir="cache")
    db = lens.compute_concept_db(cv, batch_size=64)

The Collect sweep streams (B, T) int32 token batches through the jitted
engine exactly like image batches (the top-k state, checkpointing, mesh DP,
and cache format are modality-agnostic).
"""

from __future__ import annotations

import logging

import numpy as np

from semanticlens_tpu.collect.activation_based import ActivationComponentVisualizer
from semanticlens_tpu.collect.sae_based import SAEComponentVisualizer
from semanticlens_tpu.ops import aggregators

logger = logging.getLogger(__name__)


class _TextsView:
    """List-of-strings dataset facade with a stable name for cache identity."""

    def __init__(self, texts, name: str | None = None):
        self.texts = list(texts)
        if name is not None:
            self.name = name

    def __len__(self):
        return len(self.texts)

    def __getitem__(self, i):
        return self.texts[i]


class TokenTextDataset:
    """Paired (token array, raw string) samples for LM dissection.

    ``tokens`` is an (N, T) int array (the SUBJECT model's tokenization,
    fixed length — pad/truncate upstream; prefer LEFT-padding so
    :func:`~semanticlens_tpu.ops.aggregators.aggregate_transformer_last_token`
    reads a real token at T−1); ``texts`` the N raw strings the FM embeds.
    The dataset itself yields token rows (what the collect engine streams);
    :meth:`texts_view` yields the strings (what the Embed stage consumes).

    IMPORTANT: padded corpora need a pad-aware subject — construct the LM
    with the matching ``pad_id`` (``GPT2(..., pad_id=...)`` /
    ``Llama(..., pad_id=...)``) so pad tokens are masked out of attention
    and positions count real tokens. Without it, every real token attends
    to the pad run and the collected activations are contaminated.
    """

    def __init__(self, tokens, texts, name: str | None = None,
                 *, pad_id: int | None = None, pad: str | None = None):
        self.images = np.asarray(tokens)  # `.images` = engine fast path
        if self.images.ndim != 2:
            raise ValueError(f"tokens must be (N, T), got {self.images.shape}")
        self.texts = list(texts)
        if len(self.texts) != len(self.images):
            raise ValueError(
                f"tokens/texts length mismatch: {len(self.images)} vs {len(self.texts)}"
            )
        # padding metadata (None for externally built token matrices):
        # consumers like tools/lm_audit.py read pad_id to build a pad-aware
        # subject without re-deriving it.
        self.pad_id = pad_id
        self.pad = pad
        if name is not None:
            self.name = name

    def __len__(self):
        return len(self.images)

    def __getitem__(self, i):
        return self.images[i]

    @classmethod
    def from_texts(cls, texts, tokenize_fn, seq_len: int, *, pad: str = "left",
                   pad_id: int = 0, name: str | None = None) -> "TokenTextDataset":
        """Tokenize + pad a corpus into a fixed-length dataset.

        ``tokenize_fn(text) -> sequence of ints`` is the SUBJECT model's
        tokenizer (an HF tokenizer's ``encode`` works directly). Over-long
        sequences keep their TAIL (``ids[-seq_len:]``, the HF left-side
        convention) so the sequence's FINAL real token survives — that is
        what ``aggregate_transformer_last_token`` summarizes. Short
        sequences pad with ``pad_id``; the default is LEFT-padding, which
        keeps that final token at position T−1.

        Construct the subject model with the same ``pad_id``
        (``GPT2(..., pad_id=pad_id)``) — the models mask edge-pad runs out
        of attention and count positions over real tokens only, so padded
        rows produce exactly the unpadded activations at real positions.
        Pick a ``pad_id`` that never STARTS or ENDS a genuine text (the
        models mask edge runs only, so mid-text occurrences are safe).
        """
        if pad not in ("left", "right"):
            raise ValueError(f"pad must be 'left' or 'right', got {pad!r}")
        rows = np.full((len(texts), seq_len), pad_id, np.int32)
        for i, t in enumerate(texts):
            ids = list(tokenize_fn(t))[-seq_len:]
            if pad == "left":
                rows[i, seq_len - len(ids):] = ids
            else:
                rows[i, : len(ids)] = ids
        return cls(rows, texts, name=name, pad_id=pad_id, pad=pad)

    def texts_view(self) -> _TextsView:
        return _TextsView(self.texts, name=getattr(self, "name", None))


class TextActivationComponentVisualizer(ActivationComponentVisualizer):
    """ActivationComponentVisualizer for language-model subjects.

    Same constructor contract as the vision CV with two text defaults:
    ``aggregate_fn`` falls back to token-mean (transformer activations are
    (B, T, D)), and the engine's input preprocess keeps tokens integer
    (the vision default would cast them to float32 and break the embedding
    gather). ``dataset_fm`` must yield raw strings (see
    :class:`TokenTextDataset.texts_view`).
    """

    def __init__(
        self,
        model,
        dataset_model,
        dataset_fm,
        layer_names,
        num_samples,
        device=None,
        aggregate_fn=None,
        cache_dir=None,
        mesh=None,
        params=None,
        model_preprocess=None,
    ):
        # explicit mirror of the parent signature so positional callers get
        # the text defaults too (a *args/**kwargs wrapper injecting kwargs
        # would raise 'got multiple values' on a positional aggregate_fn)
        super().__init__(
            model,
            dataset_model,
            dataset_fm,
            layer_names,
            num_samples,
            device=device,
            aggregate_fn=aggregate_fn or aggregators.aggregate_transformer_mean,
            cache_dir=cache_dir,
            mesh=mesh,
            params=params,
            model_preprocess=model_preprocess or _keep_tokens_integer,
        )

    def _run_fused(self, fm, batch_size: int, checkpoint: int = 0) -> np.ndarray:
        """No fused path for text: Collect streams token batches while Embed
        consumes raw strings — they are different datasets by construction.
        Reaching here means ``dataset_fm`` was the token dataset itself."""
        raise TypeError(
            "dataset_fm must yield raw strings for the text Embed stage "
            "(pass TokenTextDataset.texts_view(), not the token dataset)"
        )

    def _embed_vision_dataset(self, fm, batch_size: int, checkpoint: int = 512, **kwargs) -> np.ndarray:
        """Embed every evidence STRING once via the FM text tower → (N, D).

        Overrides the vision embed loop (tokenize on host, encode on
        device); the name is kept so the parent's concept-DB orchestration
        — fused-path gating, embedding-table retention, zero-row sentinels
        — applies unchanged.
        """
        texts = [self.dataset_fm[i] for i in range(len(self.dataset_fm))]
        bad = next((t for t in texts if not isinstance(t, str)), None)
        if bad is not None:
            raise TypeError(
                f"dataset_fm must yield raw strings for the text Embed stage, got {type(bad)}"
            )
        chunks = []
        for start in range(0, len(texts), batch_size):
            toks = fm.tokenize(texts[start : start + batch_size])
            chunks.append(np.asarray(fm.encode_text(toks), np.float32))
        embeds = np.concatenate(chunks, axis=0)
        assert embeds.shape[0] == len(texts), "Number of embeddings does not match number of ids!"
        return embeds

    def get_max_reference_texts(self, layer_name: str) -> list[list[str]]:
        """Top-activating evidence STRINGS per component (−1 sentinels → '')."""
        ids = self.get_max_reference(layer_name)
        return [
            [self.dataset_fm[int(i)] if i >= 0 else "" for i in row] for row in ids
        ]

    def visualize_components(self, component_ids, layer_name: str, n_samples: int = 5,
                             save: bool = True, **kwargs):
        """Text analogue of the image-grid plot: one evidence-text block per
        component, returned as a string and (optionally) written under
        ``storage_dir/plots``. Same (component_ids, layer_name) order as the
        base image-grid method."""
        texts = self.get_max_reference_texts(layer_name)
        lines = []
        for comp in component_ids:
            lines.append(f"[{layer_name} #{comp}]")
            for rank, t in enumerate(texts[int(comp)][:n_samples]):
                lines.append(f"  {rank + 1}. {t!r}")
        report = "\n".join(lines)
        if save and self.caching:
            out = self.storage_dir / "plots"
            out.mkdir(parents=True, exist_ok=True)
            path = out / f"{layer_name}-components.txt"
            path.write_text(report)
            logger.info(f"Wrote text evidence report to {path}")
        return report


def _keep_tokens_integer(x):
    """Engine input preprocess for token batches (module-level: the engine
    serializes nothing about it, but a stable name aids debugging)."""
    import jax.numpy as jnp

    return x.astype(jnp.int32)


class TextSAEComponentVisualizer(SAEComponentVisualizer, TextActivationComponentVisualizer):
    """SAE latents of a LANGUAGE model audited with text evidence.

    Cooperative composition: the SAE constructor wraps the subject with the
    virtual ``"{layer}.sae"`` tap (sparse codes as components), the text
    mixin supplies the string Embed stage, integer token preprocessing, and
    text evidence reports. The per-sample latent score stays
    ``aggregate_max_auto`` (max over token positions — sparse codes make
    means uninformative).
    """

    @staticmethod
    def train(model, dataset, layer_name, cfg, *, model_preprocess=None, **kwargs):
        """SAE training over token batches: defaults the engine preprocess
        to the integer cast (the base trainer's float32 default would feed
        float "tokens" to subjects that index an embedding table)."""
        return SAEComponentVisualizer.train(
            model, dataset, layer_name, cfg,
            model_preprocess=model_preprocess or _keep_tokens_integer, **kwargs,
        )
