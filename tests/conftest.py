"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding logic (cross-shard top-k merge, all-gather embed) is unit-tested on
CPU "devices" per SURVEY.md §4; real-TPU benchmarks run separately via
bench.py.

Note: the ambient environment registers a TPU backend at interpreter start
(sitecustomize imports jax), so env vars are already cached — use
jax.config.update, which works post-import.
"""

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Tiering (driven by the measured full-suite duration report, see
# docs/TESTING.md). The fast tier (`make test`, ``-m "not slow"``) keeps every
# core subsystem — collect engine, top-k, aggregators, scores, Lens,
# reference cache parity, relevance/LRP core, SAE, serving, causal, data —
# plus the FLAGSHIP subject families (ResNet, ViT, GPT-2, Llama) that pin the
# model/tap contract. Marked ``slow``: full-size parity twins, multi-process
# DCN tests, fuzz sweeps, the zoo-BREADTH family modules (each family's
# contract is identical to a flagship's; their tests re-prove it at scale),
# and individual outlier tests listed below.
_SLOW_MODULES = {
    # long-running by nature
    "test_fullsize_lm_parity",   # full-size GPT-2 / Llama-3.2-1B / Gemma2-2B twins
    "test_fullsize_parity",      # full CLIP/SigLIP2/MobileCLIP towers vs torch twins
    "test_multihost",            # spawns 2 jax.distributed processes over DCN
    "test_round3_fuzz",          # property/fuzz sweeps (LRP conservation, crop boxes)
    "test_system_e2e",           # whole-stack mesh run
    "test_interventions_causal", # causality check across the WHOLE zoo (flagships incl.)
    "test_sharded_scores",       # 8-device score sharding (core logic in test_scores)
    "test_parallel",             # TP encode vs single-device at real widths
    # zoo breadth (flagship contract tests stay fast)
    "test_densenet", "test_efficientnet", "test_efficientnet_v2",
    "test_inception", "test_swin", "test_maxvit", "test_mobilenet",
    "test_vgg", "test_classic", "test_lrp_new_families", "test_regnet",
    "test_shufflenet", "test_mnasnet", "test_convnext",
    "test_gemma", "test_phi", "test_swin_v2",
    # FM variants beyond the core CLIP path
    "test_assets", "test_mobileclip", "test_dissect", "test_siglip",
}

# Parametrized contract sweeps where only the FLAGSHIP params stay fast; the
# zoo-breadth params re-prove the identical contract and run in the slow tier
# (they dominated the fast tier: ~9 of its 19 minutes, /tmp durations report).
_PARAM_SWEEPS = {
    "test_tap_contract.py": {"resnet18", "vit", "vit_headless", "vit_torchvision"},
}

# Individual heavy tests inside otherwise-fast modules (nodeid suffixes).
_SLOW_TESTS = {
    "test_gpt.py::test_left_padding_with_pad_id_matches_unpadded",
    "test_llama.py::test_left_padding_with_pad_id_matches_unpadded",
    "test_clip.py::test_openclip_rn50_tower",  # ViT-B/32 path stays fast
    "test_sae.py::test_approx_topk_training_identical_on_cpu",
    "test_sae.py::test_auxk_routes_gradient_to_dead_latents",
    "test_sae.py::test_transcoder_learns_nonlinear_map",
    "test_sae.py::test_skip_transcoder_absorbs_linear_map",
    "test_sae.py::test_transcoder_mesh_data_parallel_parity",
    "test_scores.py::test_null_calibrated_polysemanticity",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.rsplit("/", 1)[-1].split(".py")[0]
        base = item.nodeid.rsplit("/", 1)[-1].split("[")[0]
        if mod in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
            continue
        fname = base.split("::")[0]
        fast_params = _PARAM_SWEEPS.get(fname)
        if fast_params is not None and "[" in item.nodeid:
            param = item.nodeid.rsplit("[", 1)[-1].rstrip("]")
            if param not in fast_params:
                item.add_marker(pytest.mark.slow)
