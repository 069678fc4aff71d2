"""Serving fast path: Count-PIPNet inference without proto-map
materialization.

The training/parity forward (CountPIPNet.__call__) returns the full
[B, H, W, P] prototype maps because the align loss and all the
interpretability tooling consume them (reference count_pipnet.py:70-110).
Deployment classification only needs counts -> intermediate -> classifier,
so this path fuses the add-on 1x1 conv + per-patch softmax + spatial sum
into one Pallas kernel (ops/pallas/fused_head.py) and returns
(clamped_counts, logits) only.

Restrictions: softmax activation (the deterministic inference path).
Gumbel-hard inference is stochastic by reference design
(count_pipnet_utils.py:34-38) and keeps the XLA path.
"""



import jax
import jax.numpy as jnp

from ..ops.pallas.fused_head import (
    fused_count_head, fused_count_head_reference,
)
from .intermediates import make_intermediate
from .pipnet import CountPIPNet

__all__ = ["make_serving_fn", "shard_serving_fn"]


def make_serving_fn(model: CountPIPNet, *, use_pallas: bool = True,
                    interpret: bool = False, quantize: bool = False,
                    fused_mlp: bool = False):
    """Build a jittable (params, x) -> (clamped_counts, logits) function.

    ``quantize=True`` runs the backbone's pointwise GEMMs in int8
    (models/quantized.py) — 2x MXU rate; pass the ORIGINAL fp32 params,
    quantization happens on first trace (weights fold to int8 constants
    under jit when params are donated/static, or stay cheap per-call
    element-wise ops otherwise; for repeated serving pre-quantize with
    quantize_convnext_params and partial-apply).

    Falls back to the XLA fused reference on non-TPU backends
    (``interpret=True`` runs the Pallas kernel in interpreter mode for
    tests).
    """
    if model.activation != "softmax":
        raise ValueError(
            "serving fast path requires activation='softmax' (gumbel "
            "inference is stochastic by design; use the standard forward)")

    inter_mod = make_intermediate(
        model.intermediate_type, model.num_prototypes, model.max_count,
        use_ste=model.use_ste,
        positive_grad_strategy=model.positive_grad_strategy)

    backbone = model.backbone
    if quantize:
        from .quantized import quantize_convnext_params, \
            quant_convnext_apply

        def backbone_apply(bparams, x):
            qp = quantize_convnext_params(bparams)
            return quant_convnext_apply(
                qp, x, stride_threshold=backbone.stride_threshold,
                num_stages=backbone.num_stages,
                stage_settings=backbone.stage_settings)
    elif fused_mlp:
        from .quantized import fused_convnext_apply

        def backbone_apply(bparams, x):
            return fused_convnext_apply(
                bparams, x, stride_threshold=backbone.stride_threshold,
                num_stages=backbone.num_stages,
                stage_settings=backbone.stage_settings,
                interpret=interpret)
    else:
        def backbone_apply(bparams, x):
            return model.backbone.apply({"params": bparams}, x,
                                        deterministic=True)

    def fn(params, x):
        feats = backbone_apply(params["backbone"], x)
        if model.num_features > 0:
            kernel = params["add_on"]["conv1x1"]["kernel"]  # [1,1,C,P]
            w = kernel.reshape(kernel.shape[-2], kernel.shape[-1])
            b = params["add_on"]["conv1x1"]["bias"]
        else:
            p = feats.shape[-1]
            w = jnp.eye(p, dtype=jnp.float32)
            b = jnp.zeros((p,), jnp.float32)

        if use_pallas:
            counts = fused_count_head(feats, w, b, interpret=interpret)
        else:
            counts = fused_count_head_reference(feats, w, b)

        clamped = jnp.clip(jnp.round(counts), 0.0, float(model.max_count))
        inter = inter_mod.apply(
            {"params": params.get("intermediate", {})}, clamped)
        clf_w = params["classification"]["weight"]
        out = inter @ jax.nn.relu(clf_w).T
        if model.bias and "bias" in params["classification"]:
            out = out + params["classification"]["bias"]
        return clamped, out

    return fn


def shard_serving_fn(fn, mesh, params):
    """Bind a ``(params, x) -> pytree`` serving forward to a device mesh.

    Multi-chip data-parallel serving: parameters are replicated across
    ``mesh`` once (weights live on every chip; no per-call transfer) and
    the returned ``infer(x)`` is jitted with batch-sharded input/output
    over the mesh's first axis — XLA runs each chip on its batch shard
    with zero collectives in the forward. Plug the result directly into
    ``serving.engine.ServingEngine(infer, ..., mesh=mesh)``: the engine
    places each ladder batch with the same sharding before dispatch.

    The reference has no serving layer and its only parallelism is
    single-process ``nn.DataParallel`` (reference main.py:118); this is
    the mesh-native equivalent for inference.

    Args:
      fn: serving forward ``(params, x[B,H,W,C]) -> pytree`` with leading
        batch dim on every output leaf (e.g. from :func:`make_serving_fn`).
      mesh: a ``jax.sharding.Mesh``; the FIRST axis shards the batch.
      params: parameter pytree (host or single-device); replicated here.

    Returns:
      (infer, sharded_params): ``infer(x)`` jitted data-parallel forward
      closing over the replicated params, and the replicated param tree.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    repl = NamedSharding(mesh, P())
    batched = NamedSharding(mesh, P(axis))
    sharded_params = jax.device_put(params, repl)
    jfn = jax.jit(fn, in_shardings=(repl, batched), out_shardings=batched)

    def infer(x):
        return jfn(sharded_params, x)

    return infer, sharded_params
