"""Optimizers and LR schedules as optax transforms.

The reference uses two torch optimizers: Adam(BASE_LR, WEIGHT_DECAY) for the
model and SGD(CENTER_LR) for the center-loss centers, with center gradients
rescaled by 1/CENTER_LOSS_WEIGHT before the center step
(/root/reference/solver/build.py:9-47, train_ctl_model.py:157-159). The
BNNeck bias has requires_grad=False and is simply excluded
(modelling/bases.py:83-84).

Here that whole dance is one ``optax.multi_transform`` over a labeled
parameter partition: {model: adam, centers: scaled sgd, frozen: zero}.

LR schedule parity (epoch-indexed, /root/reference/solver/build.py:50-63 and
the warmup in modelling/bases.py:115-121):
  lr(e) = BASE_LR * warmup(e) * decay(e)
  warmup(e) = min(1, (e+1)/WARMUP_EPOCHS) while e < WARMUP_EPOCHS
  decay(e)  = GAMMA ** |{m in LR_STEPS : e >= m}|          (multistep_lr)
            = MIN_LR + (1-MIN_LR/BASE_LR-ish cosine)        (cosine_annealing)
The torch scheduler steps once per epoch, so the schedule is a function of
the epoch, injected into the optimizer state between epochs.
"""

import math

import jax.numpy as jnp
import optax


def lr_for_epoch(epoch: int, hparams) -> float:
    s = hparams.SOLVER
    lr = s.BASE_LR
    if s.LR_SCHEDULER_NAME == "multistep_lr":
        lr *= s.GAMMA ** sum(1 for m in s.LR_STEPS if epoch >= m)
    elif s.LR_SCHEDULER_NAME == "cosine_annealing":
        eta_min = s.MIN_LR
        lr = eta_min + (s.BASE_LR - eta_min) * (
            1 + math.cos(math.pi * epoch / s.MAX_EPOCHS)
        ) / 2
    else:
        raise NotImplementedError(
            f"No such scheduler {s.LR_SCHEDULER_NAME}"
        )
    if s.USE_WARMUP_LR and epoch < s.WARMUP_EPOCHS:
        # Warmup overrides the decayed LR in the reference (it writes
        # lr_scale * BASE_LR into the param groups); milestones sit after
        # warmup in every shipped config, so multiplying is equivalent —
        # except it stays correct even if they overlap.
        lr = s.BASE_LR * min(1.0, float(epoch + 1) / float(s.WARMUP_EPOCHS))
    return lr


def _torch_style_adam(learning_rate, weight_decay: float):
    """torch.optim.Adam semantics: coupled L2 (wd*p added to the gradient
    BEFORE the moment updates), b1=0.9 b2=0.999 eps=1e-8, bias correction."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def build_optimizer(params, hparams):
    """Build the joint transform over {'model': ..., 'centers': ...} params.

    Returns (tx, labels) where labels is the pytree of partition labels.
    """
    s = hparams.SOLVER
    if s.OPTIMIZER_NAME != "Adam":
        raise NotImplementedError(f"No such optimizer {s.OPTIMIZER_NAME}")

    transforms = {
        "model": optax.inject_hyperparams(_torch_style_adam)(
            learning_rate=s.BASE_LR, weight_decay=s.WEIGHT_DECAY
        ),
        # grad *= 1/CENTER_LOSS_WEIGHT, then plain SGD(CENTER_LR)
        "centers": optax.chain(
            optax.scale(1.0 / s.CENTER_LOSS_WEIGHT),
            optax.sgd(s.CENTER_LR),
        ),
        "frozen": optax.set_to_zero(),
    }
    labels = _partition_labels(params)
    return optax.multi_transform(transforms, labels), labels


def _partition_labels(params):
    """Label pytree: centers -> 'centers', bnneck bias -> 'frozen',
    everything else -> 'model'."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if path and path[0] == "centers":
            return "centers"
        if "bnneck" in path and path[-1] == "bias":
            return "frozen"
        return "model"

    return walk(params, ())


def set_learning_rate(opt_state, lr: float):
    """Inject the epoch's LR into the model transform's hyperparams.

    multi_transform keeps inner states in ``opt_state.inner_states``; the
    model entry is an InjectHyperparamsState with a ``hyperparams`` dict.
    """
    inner = opt_state.inner_states["model"].inner_state
    inner.hyperparams["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def current_learning_rate(opt_state) -> float:
    inner = opt_state.inner_states["model"].inner_state
    return float(inner.hyperparams["learning_rate"])
