"""Prismatic-style VLM: fused vision towers + projector + Llama decoder.

TPU-first re-design of ``PrismaticVLM``
(``/root/reference/prismatic/models/vlms/prismatic.py:42-485``): a frozen
config + parameter pytree + pure functions. One forward serves training and
prefill; decode steps go straight to ``llama_forward`` with the KV cache
(mirroring the reference short-circuit at ``prismatic.py:333-347``).

Fusion contract (``prismatic.py:392-424``): projected patch embeddings are
spliced *after the BOS token*; patch positions get attention True and label
IGNORE_INDEX.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from emmax_tpu.models.llama import (IGNORE_INDEX, LlamaConfig,
                                    cross_entropy_loss, embed_tokens,
                                    init_llama_params, llama_forward)
from emmax_tpu.models.projector import (init_projector_params,
                                        projector_forward)
from emmax_tpu.models.vit import ViTConfig, init_vit_params, vit_forward

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VLMConfig:
    """Static architecture description (hashable: towers as a tuple).

    ``llm`` is a LlamaConfig (Llama-2/Mistral family) or PhiConfig; the
    decoder implementation is dispatched on the config type."""

    vision: Tuple[Tuple[str, ViTConfig], ...]   # ordered (name, cfg) pairs
    llm: LlamaConfig
    arch_specifier: str = "no-align+fused-gelu-mlp"

    @property
    def vision_dim(self) -> int:
        return sum(cfg.dim for _, cfg in self.vision)

    @property
    def num_patches(self) -> int:
        counts = {cfg.num_patches for _, cfg in self.vision}
        assert len(counts) == 1, "towers must agree on patch count"
        return counts.pop()


def _llm_init(rng, llm_cfg, dtype):
    from emmax_tpu.models.phi import PhiConfig, init_phi_params

    if isinstance(llm_cfg, PhiConfig):
        return init_phi_params(rng, llm_cfg, dtype)
    return init_llama_params(rng, llm_cfg, dtype)


def llm_apply(params, llm_cfg, inputs_embeds, **kw):
    """Decoder dispatch by config type (Llama family vs Phi)."""
    from emmax_tpu.models.phi import PhiConfig, phi_forward

    if isinstance(llm_cfg, PhiConfig):
        return phi_forward(params, llm_cfg, inputs_embeds, **kw)
    return llama_forward(params, llm_cfg, inputs_embeds, **kw)


def init_vlm_params(rng: jax.Array, cfg: VLMConfig, dtype=jnp.float32) -> Params:
    k_vision, k_proj, k_llm = jax.random.split(rng, 3)
    vision_keys = jax.random.split(k_vision, max(len(cfg.vision), 1))
    return {
        "vision": {name: init_vit_params(k, vcfg, dtype)
                   for k, (name, vcfg) in zip(vision_keys, cfg.vision)},
        "projector": init_projector_params(k_proj, cfg.arch_specifier,
                                           cfg.vision_dim, cfg.llm.dim, dtype),
        "llm": _llm_init(k_llm, cfg.llm, dtype),
    }


def encode_images(params: Params, cfg: VLMConfig,
                  pixel_values: Dict[str, jax.Array], *,
                  attn_impl: str = "xla",
                  stop_tower_gradient: bool = False) -> jax.Array:
    """Run every tower on its own normalized image and concat on channels
    (``dinosiglip_vit.py:142-147``), then project to LLM dim.

    ``stop_tower_gradient`` stops gradients at the TOWER OUTPUTS (before
    the projector) — the align-stage contract: frozen towers, trainable
    projector (reference ``freeze_backbones("align")``).

    ``pixel_values={"tower_features": [B, P, C]}`` feeds pre-computed
    channel-concat tower outputs straight to the projector (C = sum of
    tower widths, e.g. 1024+1152 for DinoSigLIP). In frozen-tower stages
    the tower outputs are constants per sample, so caching them across
    epochs is sound: the projector still trains (gradients flow to it, not
    past it), ``params["vision"]`` need not exist on device (−1.33 GB at
    the 7B align stage), and the tower forward is skipped entirely. The
    serving engines' pre-encoded ``{"patches": ...}`` input is the same
    idea post-projector; training must cache PRE-projector because the
    projector is the trainable piece."""
    if "tower_features" in pixel_values:
        fused = jax.lax.stop_gradient(pixel_values["tower_features"])
        return projector_forward(params["projector"], fused)
    fused = encode_tower_features(params, cfg, pixel_values,
                                  attn_impl=attn_impl)
    if stop_tower_gradient:
        fused = jax.lax.stop_gradient(fused)
    return projector_forward(params["projector"], fused)


def encode_tower_features(params: Params, cfg: VLMConfig,
                          pixel_values: Dict[str, jax.Array], *,
                          attn_impl: str = "xla") -> jax.Array:
    """Pre-projector channel-concat tower outputs [B, P, C] — the quantity
    ``pixel_values={"tower_features": ...}`` feeds back in (see
    ``encode_images``)."""
    feats = [vit_forward(params["vision"][name], vcfg, pixel_values[name],
                         attn_impl=attn_impl)
             for name, vcfg in cfg.vision]
    return feats[0] if len(feats) == 1 else jnp.concatenate(feats, axis=-1)


def fuse_multimodal(patch_embeds: jax.Array, input_embeds: jax.Array,
                    mask: jax.Array, labels: Optional[jax.Array] = None,
                    multimodal_mask: Optional[jax.Array] = None):
    """Splice patches after each row's BOS: [pads... | bos | patches | text].

    Generalizes the reference splice (``prismatic.py:392-424``, which assumes
    BOS at index 0) to left-padded batches: for a row whose first valid token
    sits at index ``p``, the fused row is text[:p+1] | patches | text[p+1:].
    With no padding this is byte-identical to the reference layout. Patch
    slots are always valid and labeled IGNORE.

    ``multimodal_mask`` ([B] bool) marks rows WITH an image; text-only rows
    take the reference's unimodal merge instead (``prismatic.py:442-471``):
    [text | zeros(P)] with mask False / labels IGNORE over the zero block —
    same static fused length, so mixed batches stay one XLA program.

    Returns (embeds, mask, labels, positions).
    """
    B, P, D = patch_embeds.shape
    L = input_embeds.shape[1]
    F = L + P
    # first valid index per row (0 when unpadded / right-padded)
    p = jnp.argmax(mask, axis=-1).astype(jnp.int32)          # [B]
    # an ALL-padding row has no BOS: without this its P patch slots would
    # read as valid (argmax=0) and prefill live cache slots for a row that
    # contains nothing
    row_live = jnp.any(mask, axis=-1, keepdims=True)         # [B, 1]
    j = jnp.arange(F, dtype=jnp.int32)[None, :]              # [1, F]
    pe = p[:, None]
    if multimodal_mask is None:
        mm = jnp.ones((B, 1), jnp.bool_)
    else:
        mm = multimodal_mask.reshape(B, 1).astype(jnp.bool_)
    # multimodal rows: patches spliced after BOS; unimodal rows: zero block
    # appended at the end (reference unimodal merge layout)
    is_patch = jnp.where(mm, (j > pe) & (j <= pe + P), j >= L)
    # source index into concat([text (L), patches (P)]):
    src_text = jnp.where(mm & (j > pe), j - P, j)            # before/after splice
    src = jnp.where(is_patch, L + jnp.clip(j - pe - 1, 0, P - 1), src_text)
    source = jnp.concatenate(
        [input_embeds, patch_embeds.astype(input_embeds.dtype)], axis=1)
    embeds = jnp.take_along_axis(source, jnp.clip(src, 0, F - 1)[..., None],
                                 axis=1)
    embeds = jnp.where((is_patch & ~mm)[..., None],
                       jnp.zeros((), embeds.dtype), embeds)
    fused_mask = jnp.where(
        is_patch, mm & row_live,
        jnp.take_along_axis(mask, jnp.clip(src_text, 0, L - 1), axis=1))
    fused_labels = None
    if labels is not None:
        fused_labels = jnp.where(
            is_patch, IGNORE_INDEX,
            jnp.take_along_axis(labels, jnp.clip(src_text, 0, L - 1), axis=1))
    positions = jnp.clip(jnp.cumsum(fused_mask.astype(jnp.int32), axis=-1) - 1, 0)
    return embeds, fused_mask, fused_labels, positions


def vlm_forward(
    params: Params,
    cfg: VLMConfig,
    input_ids: jax.Array,                       # [B, L]
    pixel_values: Dict[str, jax.Array],         # name -> [B, H, W, 3]
    mask: Optional[jax.Array] = None,           # [B, L] bool
    labels: Optional[jax.Array] = None,         # [B, L] int (-100 ignore)
    *,
    kv_cache=None,
    attn_impl: str = "xla",
    remat: bool = False,
    stop_vision_gradient: bool = False,
    multimodal_mask: Optional[jax.Array] = None,  # [B] bool; None = all mm
    ce_chunk: Optional[int] = None,
    scan_weight_barrier: bool = False,
):
    """Multimodal forward. Returns (logits, loss_or_None, new_cache_or_None).

    The returned logits cover the fused sequence [bos | patches | text[1:]].
    Text-only rows of a mixed batch (``multimodal_mask`` False) take the
    reference's unimodal merge (see ``fuse_multimodal``).

    ``ce_chunk`` (training-only, requires ``labels``): compute the loss with
    ``chunked_ce_loss_and_preds`` — the first return value is then greedy
    PREDS [B, F] int32 instead of logits (full fp32 logits are never
    materialized; see the llama.py docstring for the memory math).
    """
    if mask is None:
        mask = jnp.ones(input_ids.shape, jnp.bool_)
    # stop at the tower outputs, NOT after the projector: stopping the
    # projected embeds would silently zero the projector's gradients too,
    # breaking the align stage (frozen towers + TRAINABLE projector)
    patch_embeds = encode_images(params, cfg, pixel_values,
                                 attn_impl=attn_impl,
                                 stop_tower_gradient=stop_vision_gradient)
    input_embeds = embed_tokens(params["llm"], input_ids)
    embeds, fmask, flabels, positions = fuse_multimodal(
        patch_embeds, input_embeds, mask, labels,
        multimodal_mask=multimodal_mask)
    if ce_chunk and flabels is not None:
        from emmax_tpu.models.llama import chunked_ce_loss_and_preds

        h, new_cache = llm_apply(
            params["llm"], cfg.llm, embeds, mask=fmask, positions=positions,
            kv_cache=kv_cache, attn_impl=attn_impl, remat=remat,
            return_hidden=True, scan_weight_barrier=scan_weight_barrier)
        loss, preds = chunked_ce_loss_and_preds(
            h, params["llm"]["lm_head"], flabels, chunk=ce_chunk)
        return preds, loss, new_cache
    logits, new_cache = llm_apply(
        params["llm"], cfg.llm, embeds, mask=fmask, positions=positions,
        kv_cache=kv_cache, attn_impl=attn_impl, remat=remat,
        scan_weight_barrier=scan_weight_barrier)
    loss = cross_entropy_loss(logits, flabels) if flabels is not None else None
    return logits, loss, new_cache


def text_forward(params: Params, cfg: VLMConfig, input_ids: jax.Array,
                 mask=None, labels=None, *, attn_impl: str = "xla",
                 remat: bool = False):
    """Unimodal (text-only) forward — reference ``prismatic.py:356-369``."""
    embeds = embed_tokens(params["llm"], input_ids)
    logits, _ = llm_apply(params["llm"], cfg.llm, embeds, mask=mask,
                          attn_impl=attn_impl, remat=remat)
    loss = cross_entropy_loss(logits, labels) if labels is not None else None
    return logits, loss


# === Reference model shape: the Emma-X flagship ===
def emma_x_vlm_config() -> VLMConfig:
    from emmax_tpu.models.vit import DINOV2_L_REG4, SIGLIP_SO400M
    from emmax_tpu.models.llama import LLAMA2_7B

    return VLMConfig(
        vision=(("dino", DINOV2_L_REG4), ("siglip", SIGLIP_SO400M)),
        llm=LLAMA2_7B,
        arch_specifier="no-align+fused-gelu-mlp",
    )


def tiny_vlm_config(vocab_size: int = 512) -> VLMConfig:
    """Small config for tests/smoke runs (matching structure, tiny dims)."""
    dino = ViTConfig(img_size=28, patch_size=14, dim=32, depth=3, n_heads=2,
                     hidden_dim=64, class_token=True, num_reg_tokens=4,
                     layerscale=True)
    siglip = ViTConfig(img_size=28, patch_size=14, dim=48, depth=4, n_heads=2,
                       hidden_dim=96, class_token=False, gelu_tanh=True)
    llm = LlamaConfig(vocab_size=vocab_size, dim=64, n_layers=2, n_heads=4,
                      n_kv_heads=4, hidden_dim=128, max_seq_len=256)
    return VLMConfig(vision=(("dino", dino), ("siglip", siglip)), llm=llm)
