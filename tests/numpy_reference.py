"""Independent numpy re-implementation of the ST-MaskGIT forward pass.

Written directly from the architecture spec (SURVEY.md §2a rows 5-8) as a
golden reference for the JAX model — the `test_attention.py` pattern of the
reference repo (slow obvious math kept alongside the fast path), generalized
to the whole network. Operates on a torch-style named state dict
(the reference checkpoint naming), which also exercises the checkpoint
converter mapping.
"""

import numpy as np


def layer_norm(x, weight, bias, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * weight + bias


def softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def gelu_exact(x):
    from scipy.special import erf  # scipy ships with the image's numpy stack
    return 0.5 * x * (1 + erf(x / np.sqrt(2)))


def attention(x, sd, prefix, num_heads, causal, qk_norm, use_mup):
    """x: (B, N, C). Torch-style weights: qkv.weight (3C, C), proj.weight (C, C)."""
    B, N, C = x.shape
    hd = C // num_heads
    scale = 8.0 / hd if use_mup else hd ** -0.5

    qkv_w = sd[f"{prefix}.qkv.weight"]  # (3C, C)
    qkv = x @ qkv_w.T
    if f"{prefix}.qkv.bias" in sd:
        qkv = qkv + sd[f"{prefix}.qkv.bias"]
    qkv = qkv.reshape(B, N, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)

    if qk_norm:
        w, b = sd[f"{prefix}.norm.weight"], sd[f"{prefix}.norm.bias"]
        q = layer_norm(q, w, b)
        k = layer_norm(k, w, b)

    # (B, H, N, hd)
    q = q.transpose(0, 2, 1, 3) * scale
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    logits = q @ k.transpose(0, 1, 3, 2)
    if causal:
        mask = np.tril(np.ones((N, N), dtype=bool))
        logits = np.where(mask, logits, -1e30)
    probs = softmax(logits)
    out = (probs @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
    out = out @ sd[f"{prefix}.proj.weight"].T + sd[f"{prefix}.proj.bias"]
    return out


def forward_logits(sd, tokens_BTHW, config):
    """Full compute_logits in numpy. Returns (B, T, S, V, F) float32."""
    B, T, H, W = tokens_BTHW.shape
    S, C = H * W, config.d_model
    V, F = config.factored_vocab_size, config.num_factored_vocabs
    ids = tokens_BTHW.reshape(B, T, S)

    # factorized embedding + mask embedding
    emb = np.zeros((B, T, S, C), dtype=np.float64)
    is_mask = ids == config.mask_token_id
    safe = np.where(is_mask, 0, ids)
    for f in range(F):
        digit = (safe // (V ** f)) % V
        emb += sd[f"token_embed.factored_embeds.{f}.weight"][digit]
    emb = np.where(is_mask[..., None], sd["token_embed.mask_token_embed"][0], emb)

    x = emb + sd["pos_embed_TSC"][0]

    for i in range(config.num_layers):
        pre = f"decoder.layers.{i}"
        # spatial attention over S (per frame), bidirectional, with optional pre-LN
        xs = x.reshape(B * T, S, C)
        h = xs if config.qk_norm else layer_norm(
            xs, sd[f"{pre}.norm1.weight"], sd[f"{pre}.norm1.bias"])
        xs = xs + attention(h, sd, f"{pre}.spatial_attn", config.num_heads,
                            causal=False, qk_norm=config.qk_norm,
                            use_mup=config.use_mup)
        x = xs.reshape(B, T, S, C)

        # temporal attention over T (per spatial position), causal, NO pre-norm
        xt = x.transpose(0, 2, 1, 3).reshape(B * S, T, C)
        xt = xt + attention(xt, sd, f"{pre}.temporal_attn", config.num_heads,
                            causal=True, qk_norm=config.qk_norm,
                            use_mup=config.use_mup)

        # MLP with optional pre-LN
        h = xt if config.qk_norm else layer_norm(
            xt, sd[f"{pre}.norm2.weight"], sd[f"{pre}.norm2.bias"])
        h = gelu_exact(h @ sd[f"{pre}.mlp.fc1.weight"].T + sd[f"{pre}.mlp.fc1.bias"])
        h = h @ sd[f"{pre}.mlp.fc2.weight"].T + sd[f"{pre}.mlp.fc2.bias"]
        xt = xt + h
        x = xt.reshape(B, S, T, C).transpose(0, 2, 1, 3)

    if config.use_mup:
        x = x / config.width_mult
    logits = x @ sd["out_x_proj.weight"].T + sd["out_x_proj.bias"]  # (B,T,S,F*V)
    return logits.reshape(B, T, S, F, V).transpose(0, 1, 2, 4, 3).astype(np.float32)


def random_torch_state_dict(config, seed=0):
    """Random reference-named state dict (numpy) for parity tests."""
    rng = np.random.RandomState(seed)
    C, V, F = config.d_model, config.factored_vocab_size, config.num_factored_vocabs
    hd = C // config.num_heads

    def r(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float64)

    sd = {
        "pos_embed_TSC": r(1, config.T, config.S, C),
        "token_embed.mask_token_embed": r(1, C),
        "out_x_proj.weight": r(F * V, C),
        "out_x_proj.bias": r(F * V),
    }
    for f in range(F):
        sd[f"token_embed.factored_embeds.{f}.weight"] = r(V, C)
    for i in range(config.num_layers):
        pre = f"decoder.layers.{i}"
        for attn in ("spatial_attn", "temporal_attn"):
            sd[f"{pre}.{attn}.qkv.weight"] = r(3 * C, C)
            sd[f"{pre}.{attn}.proj.weight"] = r(C, C)
            sd[f"{pre}.{attn}.proj.bias"] = r(C)
            if config.qkv_bias:
                sd[f"{pre}.{attn}.qkv.bias"] = r(3 * C)
            if config.qk_norm:
                sd[f"{pre}.{attn}.norm.weight"] = 1 + 0.1 * r(hd)
                sd[f"{pre}.{attn}.norm.bias"] = 0.1 * r(hd)
        if not config.qk_norm:
            for norm in ("norm1", "norm2"):
                sd[f"{pre}.{norm}.weight"] = 1 + 0.1 * r(C)
                sd[f"{pre}.{norm}.bias"] = 0.1 * r(C)
        sd[f"{pre}.mlp.fc1.weight"] = r(int(C * config.mlp_ratio), C)
        sd[f"{pre}.mlp.fc1.bias"] = r(int(C * config.mlp_ratio))
        sd[f"{pre}.mlp.fc2.weight"] = r(C, int(C * config.mlp_ratio))
        sd[f"{pre}.mlp.fc2.bias"] = r(C)
    return sd
