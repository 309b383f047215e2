"""Functional torch oracles for parity tests.

These run ``torch.nn.functional`` ops in the exact order documented for the
reference backbones (see citations in centroids_reid_tpu/models/resnet.py),
consuming the *flax* parameter trees (converting layouts back to torch
conventions on the fly). They validate conv/BN/pool numerics and layout
conversion without depending on torchvision.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _t(a):
    return torch.from_numpy(np.array(a, dtype=np.float32))


def conv_nchw(x, kernel_hwio, stride):
    w = _t(kernel_hwio).permute(3, 2, 0, 1)  # HWIO -> OIHW
    pad = kernel_hwio.shape[0] // 2
    return F.conv2d(x, w, stride=stride, padding=pad)


def bn_eval(x, p, s):
    return F.batch_norm(
        x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]), _t(p["bias"]),
        training=False, eps=1e-5,
    )


def instnorm(x, p):
    return F.instance_norm(x, weight=_t(p["scale"]), bias=_t(p["bias"]), eps=1e-5)


def _maybe_ibn(x, p, s):
    """bn1 may be an IBN split (IN on first half, BN on second half)."""
    if "IN" in p:
        half = x.shape[1] // 2
        x_in = instnorm(x[:, :half], p["IN"])
        x_bn = bn_eval(x[:, half:], p["BN"], s["BN"])
        return torch.cat([x_in, x_bn], 1)
    return bn_eval(x, p, s)


def bottleneck(x, p, s, stride):
    out = conv_nchw(x, p["conv1"]["kernel"], 1)
    out = F.relu(_maybe_ibn(out, p["bn1"], s.get("bn1", {})))
    out = conv_nchw(out, p["conv2"]["kernel"], stride)
    out = F.relu(bn_eval(out, p["bn2"], s["bn2"]))
    out = conv_nchw(out, p["conv3"]["kernel"], 1)
    out = bn_eval(out, p["bn3"], s["bn3"])
    residual = x
    if "downsample_conv" in p:
        residual = conv_nchw(x, p["downsample_conv"]["kernel"], stride)
        residual = bn_eval(residual, p["downsample_bn"], s["downsample_bn"])
    return F.relu(out + residual)


def basicblock(x, p, s, stride):
    out = conv_nchw(x, p["conv1"]["kernel"], stride)
    out = F.relu(bn_eval(out, p["bn1"], s["bn1"]))
    out = conv_nchw(out, p["conv2"]["kernel"], 1)
    out = bn_eval(out, p["bn2"], s["bn2"])
    residual = x
    if "downsample_conv" in p:
        residual = conv_nchw(x, p["downsample_conv"]["kernel"], stride)
        residual = bn_eval(residual, p["downsample_bn"], s["downsample_bn"])
    return F.relu(out + residual)


def resnet_trunk(x_nchw, params, batch_stats, layers, last_stride,
                 bottleneck_blocks=True, stem_relu=False):
    """Forward of the reference trunk: conv1 -> bn1 -> [relu] -> maxpool ->
    layer1..4 (resnet.py:122-133, resnet_ibn_a.py:126-141)."""
    x = _t(x_nchw) if isinstance(x_nchw, np.ndarray) else x_nchw
    x = conv_nchw(x, params["conv1"]["kernel"], 2)
    x = bn_eval(x, params["bn1"], batch_stats["bn1"])
    if stem_relu:
        x = F.relu(x)
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    block = bottleneck if bottleneck_blocks else basicblock
    strides = (1, 2, 2, last_stride)
    for stage, nblocks in enumerate(layers):
        for b in range(nblocks):
            name = f"layer{stage + 1}_{b}"
            stride = strides[stage] if b == 0 else 1
            x = block(x, params[name], batch_stats[name], stride)
    return x


def randomize_stats(batch_stats, seed=0):
    """Make BN running stats non-trivial so eval-mode parity is meaningful."""
    rng = np.random.RandomState(seed)

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "mean":
                out[k] = rng.normal(0, 0.5, np.shape(v)).astype(np.float32)
            elif k == "var":
                out[k] = rng.uniform(0.5, 2.0, np.shape(v)).astype(np.float32)
            else:
                out[k] = v
        return out

    return walk(batch_stats)


def randomize_params(params, seed=0):
    """Random weights (incl. BN scale/bias) for parity tests."""
    rng = np.random.RandomState(seed)

    def walk(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k == "kernel":
                fan = np.prod(np.shape(v)[:-1])
                out[k] = rng.normal(0, np.sqrt(2.0 / fan), np.shape(v)).astype(
                    np.float32
                )
            elif k == "scale":
                out[k] = rng.uniform(0.5, 1.5, np.shape(v)).astype(np.float32)
            else:
                out[k] = rng.normal(0, 0.2, np.shape(v)).astype(np.float32)
        return out

    return walk(params)


# ---------------------------------------------------------------------------
# State-dict oracle — consumes a TORCH-convention state_dict directly (OIHW
# convs, OI linears), so converter bugs cannot cancel out: the flax side goes
# through models/convert.py while this side never does. Mirrors the reference
# eval path emb = bn(avgpool(backbone(x))) (modelling/bases.py:169-177,
# baseline.py:89-96) and logits = fc_query(emb) (bases.py:86-87).
# ---------------------------------------------------------------------------


def _sd_conv(x, sd, name, stride):
    w = sd[name + ".weight"]
    w = w if torch.is_tensor(w) else torch.from_numpy(np.array(w))
    return F.conv2d(x, w.float(), stride=stride, padding=w.shape[2] // 2)


def _sd_bn(x, sd, name):
    def g(leaf):
        v = sd[name + "." + leaf]
        return (v if torch.is_tensor(v) else torch.from_numpy(np.array(v))).float()
    return F.batch_norm(
        x, g("running_mean"), g("running_var"), g("weight"), g("bias"),
        training=False, eps=1e-5,
    )


def _sd_bottleneck(x, sd, prefix, stride):
    out = F.relu(_sd_bn(_sd_conv(x, sd, prefix + ".conv1", 1), sd, prefix + ".bn1"))
    out = F.relu(_sd_bn(_sd_conv(out, sd, prefix + ".conv2", stride), sd, prefix + ".bn2"))
    out = _sd_bn(_sd_conv(out, sd, prefix + ".conv3", 1), sd, prefix + ".bn3")
    residual = x
    if prefix + ".downsample.0.weight" in sd:
        residual = _sd_bn(
            _sd_conv(x, sd, prefix + ".downsample.0", stride),
            sd, prefix + ".downsample.1",
        )
    return F.relu(out + residual)


def reid_embed_from_state_dict(x_nchw, sd, layers=(3, 4, 6, 3),
                               last_stride=1, stem_relu=False,
                               backbone_prefix="backbone."):
    """Full reference eval path from a torch state_dict.

    Returns (embeddings [N, D], logits [N, num_classes]). The plain ResNet
    omits the stem ReLU (resnet.py:97,125)."""
    x = torch.from_numpy(np.array(x_nchw)).float()
    p = backbone_prefix
    x = _sd_conv(x, sd, p + "conv1", 2)
    x = _sd_bn(x, sd, p + "bn1")
    if stem_relu:
        x = F.relu(x)
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    strides = (1, 2, 2, last_stride)
    for stage, nblocks in enumerate(layers):
        for b in range(nblocks):
            stride = strides[stage] if b == 0 else 1
            x = _sd_bottleneck(x, sd, f"{p}layer{stage + 1}.{b}", stride)
    feat = F.adaptive_avg_pool2d(x, 1).flatten(1)     # baseline.py:89-96
    emb = _sd_bn(feat, sd, "bn")                      # BNNeck, bases.py:83-84
    w = sd["fc_query.weight"]
    w = (w if torch.is_tensor(w) else torch.from_numpy(np.array(w))).float()
    logits = emb @ w.T                                # bias-free, bases.py:86-87
    return emb, logits


def make_reference_state_dict(layers=(3, 4, 6, 3), num_classes=751,
                              feat_dim=2048, seed=0):
    """Random torch-convention state_dict shaped like a reference Lightning
    checkpoint (backbone.* + bn.* + fc_query.weight + center_loss.centers)."""
    rng = np.random.RandomState(seed)

    def conv(o, i, k):
        fan = i * k * k
        return rng.normal(0, np.sqrt(2.0 / fan), (o, i, k, k)).astype(np.float32)

    def bn(sd, name, c):
        sd[name + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[name + ".bias"] = rng.normal(0, 0.2, c).astype(np.float32)
        sd[name + ".running_mean"] = rng.normal(0, 0.5, c).astype(np.float32)
        sd[name + ".running_var"] = rng.uniform(0.5, 2.0, c).astype(np.float32)
        sd[name + ".num_batches_tracked"] = np.asarray(100)

    sd = {}
    sd["backbone.conv1.weight"] = conv(64, 3, 7)
    bn(sd, "backbone.bn1", 64)
    inplanes = 64
    for stage, nblocks in enumerate(layers):
        planes = 64 * (2 ** stage)
        for b in range(nblocks):
            pre = f"backbone.layer{stage + 1}.{b}"
            sd[pre + ".conv1.weight"] = conv(planes, inplanes, 1)
            bn(sd, pre + ".bn1", planes)
            sd[pre + ".conv2.weight"] = conv(planes, planes, 3)
            bn(sd, pre + ".bn2", planes)
            sd[pre + ".conv3.weight"] = conv(planes * 4, planes, 1)
            bn(sd, pre + ".bn3", planes * 4)
            if b == 0:
                sd[pre + ".downsample.0.weight"] = conv(planes * 4, inplanes, 1)
                bn(sd, pre + ".downsample.1", planes * 4)
            inplanes = planes * 4
    bn(sd, "bn", feat_dim)  # BNNeck
    sd["fc_query.weight"] = rng.normal(
        0, 0.01, (num_classes, feat_dim)).astype(np.float32)
    sd["center_loss.centers"] = rng.normal(
        0, 0.5, (num_classes, feat_dim)).astype(np.float32)
    return sd


# ---------------------------------------------------------------------------
# Loss oracles — explicit-loop implementations of the documented reference
# semantics (SURVEY.md §2.5, train_ctl_model.py:79-148), used to validate the
# vectorised JAX losses.
# ---------------------------------------------------------------------------


def oracle_euclidean(x, y):
    m, n = x.shape[0], y.shape[0]
    d = (x * x).sum(1)[:, None] + (y * y).sum(1)[None, :] - 2 * x @ y.T
    return d.clamp(min=1e-12).sqrt()


def oracle_cosine_dist(x, y, eps=1e-12):
    xn = x / torch.clamp(x.norm(dim=1, keepdim=True), min=eps)
    yn = y / torch.clamp(y.norm(dim=1, keepdim=True), min=eps)
    return torch.abs(1 - xn @ yn.T).clamp(min=eps)


def oracle_hard_mining(dist, labels):
    n = dist.shape[0]
    ap, an = [], []
    for i in range(n):
        pos = labels == labels[i]
        neg = ~pos
        ap.append(dist[i][pos].max())
        an.append(dist[i][neg].min())
    return torch.stack(ap), torch.stack(an)


def oracle_triplet(feats, labels, margin=0.5, dist="euclidean", mask=None):
    """Mask applied AFTER mining, like triplet_loss.py:148-151."""
    dfun = oracle_euclidean if dist == "euclidean" else oracle_cosine_dist
    dmat = dfun(feats, feats)
    ap, an = oracle_hard_mining(dmat, labels)
    if mask is not None:
        ap, an = ap[mask], an[mask]
    if margin is not None:
        loss = F.relu(ap - an + margin).mean()  # MarginRankingLoss(margin)
    else:
        loss = F.softplus(ap - an).mean()       # SoftMarginLoss
    return loss, ap, an


def oracle_ctl_loss(features, labels, is_real, k, margin=0.5):
    """Per-slot loop with boolean compaction (train_ctl_model.py:79-148)."""
    pk = features.shape[0]
    p = pk // k
    f = features.reshape(p, k, -1)
    r = is_real.reshape(p, k)

    losses, daps, dans, l2s = [], [], [], []
    for i in range(k):
        valid = r[:, i].clone()
        # pid valid in round i also requires >=1 other real slot
        for c in range(p):
            if valid[c] and r[c].sum() - int(r[c, i]) == 0:
                valid[c] = False
        if valid.sum() <= 1:
            continue
        queries, cents, labs = [], [], []
        for c in range(p):
            if not valid[c]:
                continue
            others = [s for s in range(k) if s != i and r[c, s]]
            cents.append(f[c, others].mean(0))
            queries.append(f[c, i])
            labs.append(labels[c * k])
        q = torch.stack(queries)
        ce = torch.stack(cents)
        emb = torch.cat([q, ce])
        ll = torch.cat([torch.stack(labs), torch.stack(labs)])
        loss, ap, an = oracle_triplet(emb, ll, margin)
        losses.append(loss)
        daps.append(ap.mean())
        dans.append(an.mean())
        l2s.append(ce.norm(dim=1).mean())
    return {
        "loss": torch.stack(losses).mean(),
        "dist_ap": torch.stack(daps).mean(),
        "dist_an": torch.stack(dans).mean(),
        "l2_mean_centroid": torch.stack(l2s).mean(),
        "valid_rounds": len(losses),
    }


def oracle_xent_smooth(logits, targets, num_classes, eps=0.1):
    logp = F.log_softmax(logits, dim=1)
    onehot = torch.zeros_like(logp).scatter_(1, targets[:, None], 1)
    t = (1 - eps) * onehot + eps / num_classes
    return (-t * logp).mean(0).sum()


def oracle_center_loss(x, labels, centers):
    n, c = x.shape[0], centers.shape[0]
    dmat = (
        (x * x).sum(1)[:, None].expand(n, c)
        + (centers * centers).sum(1)[None, :].expand(n, c)
        - 2 * x @ centers.T
    )
    mask = labels[:, None] == torch.arange(c)[None, :]
    return (dmat * mask.float()).clamp(1e-12, 1e12).sum() / n
