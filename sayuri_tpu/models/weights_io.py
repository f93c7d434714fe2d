"""Weight-file interop with the reference engine format.

The reference exchanges weights between trainer and engine as a text/binary
file `get main{ get info / get stack / get struct / get parameters }`
(emitter: /root/reference/train/torch/network.py:1399-1481; parser:
src/neural/loader.cc:26-183). This module makes our flax checkpoints
speak the same dialect:

- `export_reference_weights`: flax params -> v5 weight file (so nets
  trained here run in the reference C++ engine, and the gate/weights-dir
  protocol stays file-compatible)
- `import_reference_weights`: v5 weight file -> flax variables (so
  published Sayuri checkpoints drive our engine and power differential
  tests)

Layer linearization must match the reference collector order exactly
(construction order of Network.construct_layers, network.py:1106-1120):
input conv, tower sublayers, policy head, value head. BatchNorms are
stored merged ((x - m)/s with gamma/beta folded, network.py:270-290); on
import they land in running stats with identity gamma/beta — inference-
equivalent by construction.

Conv layouts: file uses torch OIHW flattened; flax uses HWIO.
"""

from __future__ import annotations

import struct as _struct

import numpy as np

from sayuri_tpu.models.network import NetConfig

_EPS = 1e-5
_BIN_SENTINEL = b"\xff\xff\xff\xff"


# ---------------------------------------------------------------------------
# layer linearization
# ---------------------------------------------------------------------------

def _block_layers(spec: str, prefix: str):
    """Yield (kind, flax_scope) entries for one tower block in collector
    order. kind in {conv_block, dw_block, fc, conv}."""
    parts = spec.split("-")
    kind = [p for p in parts if p != "SE"][0]
    has_se = "SE" in parts
    out = []
    if kind == "ResidualBlock":
        out += [("conv_block", f"{prefix}/conv1"), ("conv_block", f"{prefix}/conv2")]
    elif kind == "BottleneckBlock":
        out += [
            ("conv_block", f"{prefix}/pre"),
            ("conv_block", f"{prefix}/conv1"),
            ("conv_block", f"{prefix}/conv2"),
            ("conv_block", f"{prefix}/post"),
        ]
    elif kind == "NestedBottleneckBlock":
        out += [
            ("conv_block", f"{prefix}/pre"),
            ("conv_block", f"{prefix}/block1/conv1"),
            ("conv_block", f"{prefix}/block1/conv2"),
            ("conv_block", f"{prefix}/block2/conv1"),
            ("conv_block", f"{prefix}/block2/conv2"),
            ("conv_block", f"{prefix}/post"),
        ]
    elif kind.startswith("MixerBlock"):
        out += [
            ("dw_block", f"{prefix}/dw"),
            ("conv_block", f"{prefix}/ffn1"),
            ("conv_block", f"{prefix}/ffn2"),
        ]
    else:
        raise ValueError(f"unknown block {spec}")
    if has_se:
        out += [("fc", f"{prefix}/se/squeeze"), ("fc", f"{prefix}/se/excite")]
    return out


def layer_plan(cfg: NetConfig):
    """Full collector-order layer list [(kind, flax_scope)]."""
    plan = [("conv_block", "input_conv")]
    for i, spec in enumerate(cfg.stack):
        plan += _block_layers(spec, f"tower{i}")
    plan += [("conv_block", "policy_conv")]
    if cfg.policy_head_type == "RepLK":
        plan += [("dw_block", "policy_dw"), ("conv_block", "policy_pw")]
    plan += [
        ("fc", "policy_inter"),
        ("conv", "pol_misc"),
        ("fc", "pol_pass"),
        ("conv_block", "value_conv"),
        ("fc", "value_inter"),
        ("conv", "ownership_conv"),
        ("fc", "value_misc"),
    ]
    return plan


def _scope_get(tree, path):
    node = tree
    for k in path.split("/"):
        node = node[k]
    return node


def _scope_set(tree, path, value):
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def _merged_bn(bn_params, bn_stats):
    """(mean, std) merged form (BatchNorm2d.get_merged_params,
    network.py:270-290)."""
    mean = np.asarray(bn_stats["mean"], np.float32)
    std = np.sqrt(_EPS + np.asarray(bn_stats["var"], np.float32))
    gamma = bn_params.get("gamma")
    beta = bn_params.get("beta")
    if gamma is not None:
        std = std / np.asarray(gamma, np.float32)
    if beta is not None:
        mean = mean - np.asarray(beta, np.float32) * std
    return mean, std


def _conv_oihw(kernel_hwio):
    return np.transpose(np.asarray(kernel_hwio, np.float32), (3, 2, 0, 1))


def _dw_merged(scope_params):
    """Merged effective depthwise kernel + bias for a DepthwiseConvBlock:
    conv(+gamma broadcast) + zero-padded rep3x3 (network.py:373-624).
    File layout: [C, 1, k, k]."""

    def eff(p):
        w = np.asarray(p["weight"], np.float32)       # [k, k, C]
        g = np.asarray(p["gamma"], np.float32)        # [C]
        w_eff = w + np.sum(w * g[None, None, :], axis=-1, keepdims=True)
        return np.transpose(w_eff, (2, 0, 1))[:, None]  # [C, 1, k, k]

    wk = eff(scope_params["conv"])
    w3 = eff(scope_params["rep3x3"])
    k = wk.shape[-1]
    ps = (k - 3) // 2
    w3p = np.pad(w3, ((0, 0), (0, 0), (ps, ps), (ps, ps)))
    bias = np.asarray(scope_params["conv"]["bias"], np.float32) + np.asarray(
        scope_params["rep3x3"]["bias"], np.float32
    )
    return wk + w3p, bias


def _emit_tensors(kind, scope, params, batch_stats):
    """List of flat float arrays for one collector layer, file order."""
    p = _scope_get(params, scope)
    if kind == "conv_block":
        kern = _conv_oihw(p["Conv_0"]["kernel"])
        bn_p = p["MaskedBatchNorm_0"]
        bn_s = _scope_get(batch_stats, scope)["MaskedBatchNorm_0"]
        mean, std = _merged_bn(bn_p, bn_s)
        return [kern.ravel(), np.zeros(kern.shape[0], np.float32), mean, std]
    if kind == "dw_block":
        w, b = _dw_merged(p)
        bn_p = p["MaskedBatchNorm_0"]
        bn_s = _scope_get(batch_stats, scope)["MaskedBatchNorm_0"]
        mean, std = _merged_bn(bn_p, bn_s)
        return [w.ravel(), b, mean, std]
    if kind == "conv":
        kern = _conv_oihw(p["kernel"])
        return [kern.ravel(), np.asarray(p["bias"], np.float32)]
    if kind == "fc":
        d = p["Dense_0"]
        w = np.transpose(np.asarray(d["kernel"], np.float32))  # [out, in]
        return [w.ravel(), np.asarray(d["bias"], np.float32)]
    raise ValueError(kind)


def _struct_line(kind, scope, params, cfg):
    p = _scope_get(params, scope)
    if kind == "conv_block":
        k = p["Conv_0"]["kernel"]
        return (
            f"Convolution {k.shape[2]} {k.shape[3]} {k.shape[0]}\n"
            f"BatchNorm {k.shape[3]}\n"
        )
    if kind == "dw_block":
        k = p["conv"]["weight"]  # [k, k, C]
        return (
            f"DepthwiseConvolution 1 {k.shape[2]} {k.shape[0]}\n"
            f"BatchNorm {k.shape[2]}\n"
        )
    if kind == "conv":
        k = p["kernel"]
        return f"Convolution {k.shape[2]} {k.shape[3]} {k.shape[0]}\n"
    if kind == "fc":
        k = p["Dense_0"]["kernel"]
        return f"FullyConnect {k.shape[0]} {k.shape[1]}\n"
    raise ValueError(kind)


def export_reference_weights(
    cfg: NetConfig, variables, filename: str, binary: bool = True
):
    """Write a v5 engine weight file from flax variables."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    plan = layer_plan(cfg)

    def stack_names():
        return [s for s in cfg.stack]

    info = [
        "get info\n",
        "NNType Network\n",
        "Version 5\n",
        f"FloatType {'float32bin' if binary else 'float32'}\n",
        f"InputChannels {cfg.input_channels}\n",
        f"ResidualChannels {cfg.residual_channels}\n",
        f"ResidualBlocks {len(cfg.stack)}\n",
        f"PolicyHeadChannels {cfg.policy_head_channels}\n",
        f"ValueHeadChannels {cfg.value_head_channels}\n",
        f"ValueMisc {cfg.value_misc}\n",
        f"PolicyHeadType {cfg.policy_head_type}\n",
        f"ActivationFunction {cfg.activation}\n",
        "end info\n",
    ]

    with open(filename, "wb") as f:
        w = lambda s: f.write(s.encode())
        w("get main\n")
        for line in info:
            w(line)
        w("get stack\n")
        for s in stack_names():
            w(s + "\n")
        w("end stack\n")
        w("get struct\n")
        for kind, scope in plan:
            w(_struct_line(kind, scope, params, cfg))
        w("end struct\n")
        w("get parameters\n")
        for kind, scope in plan:
            for arr in _emit_tensors(kind, scope, params, batch_stats):
                arr = np.asarray(arr, np.float32).ravel()
                if binary:
                    f.write(arr.astype("<f4").tobytes() + _BIN_SENTINEL)
                else:
                    w(" ".join(repr(float(x)) for x in arr) + "\n")
        w("end parameters\n")
        w("end main")


# ---------------------------------------------------------------------------
# import
# ---------------------------------------------------------------------------

def import_reference_weights(filename: str):
    """Parse a v5 weight file into (NetConfig, flax variables)."""
    with open(filename, "rb") as f:
        blob = f.read()

    def read_line(pos):
        end = blob.index(b"\n", pos)
        return blob[pos:end].decode(), end + 1

    pos = 0
    line, pos = read_line(pos)
    assert line.strip() == "get main", line
    info = {}
    stack = []
    structs = []
    binary = False

    while True:
        line, pos = read_line(pos)
        tok = line.strip()
        if tok == "get info":
            while True:
                line, pos = read_line(pos)
                if line.strip() == "end info":
                    break
                k, v = line.strip().split(None, 1)
                info[k] = v
            binary = info.get("FloatType", "float32") == "float32bin"
        elif tok == "get stack":
            while True:
                line, pos = read_line(pos)
                if line.strip() == "end stack":
                    break
                stack.append(line.strip())
        elif tok == "get struct":
            while True:
                line, pos = read_line(pos)
                if line.strip() == "end struct":
                    break
                structs.append(line.strip().split())
        elif tok == "get parameters":
            break
        elif tok == "end main":
            break

    cfg = NetConfig(
        input_channels=int(info.get("InputChannels", 43)),
        residual_channels=int(info.get("ResidualChannels", 96)),
        stack=tuple(stack),
        policy_head_channels=int(info.get("PolicyHeadChannels", 32)),
        value_head_channels=int(info.get("ValueHeadChannels", 32)),
        policy_head_type=info.get("PolicyHeadType", "Normal"),
        activation=info.get("ActivationFunction", "relu"),
    )

    def read_tensor(n, pos):
        if binary:
            arr = np.frombuffer(blob, "<f4", count=n, offset=pos)
            pos += 4 * n
            assert blob[pos : pos + 4] == _BIN_SENTINEL, "bad tensor sentinel"
            return np.array(arr), pos + 4
        end = blob.index(b"\n", pos)
        arr = np.array([float(x) for x in blob[pos:end].split()], np.float32)
        assert arr.size == n, (arr.size, n)
        return arr, end + 1

    plan = layer_plan(cfg)
    params: dict = {}
    batch_stats: dict = {}
    si = 0
    se_ratio = None

    for kind, scope in plan:
        if kind == "conv_block":
            _, ic, oc, ks = structs[si]
            si += 2  # Convolution + BatchNorm lines
            ic, oc, ks = int(ic), int(oc), int(ks)
            kern, pos = read_tensor(oc * ic * ks * ks, pos)
            _bias, pos = read_tensor(oc, pos)
            mean, pos = read_tensor(oc, pos)
            std, pos = read_tensor(oc, pos)
            hwio = np.transpose(kern.reshape(oc, ic, ks, ks), (2, 3, 1, 0))
            _scope_set(params, f"{scope}/Conv_0", {"kernel": hwio})
            bn_p = {"beta": np.zeros(oc, np.float32)}
            # detect gamma presence from the flax layer later; identity works
            _scope_set(params, f"{scope}/MaskedBatchNorm_0", bn_p)
            _scope_set(
                batch_stats,
                f"{scope}/MaskedBatchNorm_0",
                {"mean": mean, "var": std * std - _EPS},
            )
        elif kind == "dw_block":
            _, ic, oc, ks = structs[si]
            si += 2
            oc, ks = int(oc), int(ks)
            kern, pos = read_tensor(oc * ks * ks, pos)
            bias, pos = read_tensor(oc, pos)
            mean, pos = read_tensor(oc, pos)
            std, pos = read_tensor(oc, pos)
            # merged kernel goes into `conv` with zero gamma & rep3x3
            w = np.transpose(kern.reshape(oc, ks, ks), (1, 2, 0))
            _scope_set(
                params,
                f"{scope}/conv",
                {
                    "weight": w,
                    "gamma": np.zeros(oc, np.float32),
                    "bias": bias,
                },
            )
            _scope_set(
                params,
                f"{scope}/rep3x3",
                {
                    "weight": np.zeros((3, 3, oc), np.float32),
                    "gamma": np.zeros(oc, np.float32),
                    "bias": np.zeros(oc, np.float32),
                },
            )
            _scope_set(params, f"{scope}/MaskedBatchNorm_0",
                       {"beta": np.zeros(oc, np.float32)})
            _scope_set(
                batch_stats,
                f"{scope}/MaskedBatchNorm_0",
                {"mean": mean, "var": std * std - _EPS},
            )
        elif kind == "conv":
            _, ic, oc, ks = structs[si]
            si += 1
            ic, oc, ks = int(ic), int(oc), int(ks)
            kern, pos = read_tensor(oc * ic * ks * ks, pos)
            bias, pos = read_tensor(oc, pos)
            hwio = np.transpose(kern.reshape(oc, ic, ks, ks), (2, 3, 1, 0))
            _scope_set(params, scope, {"kernel": hwio, "bias": bias})
        elif kind == "fc":
            _, isz, osz = structs[si]
            si += 1
            isz, osz = int(isz), int(osz)
            w_, pos = read_tensor(osz * isz, pos)
            bias, pos = read_tensor(osz, pos)
            _scope_set(
                params,
                f"{scope}/Dense_0",
                {"kernel": np.transpose(w_.reshape(osz, isz)), "bias": bias},
            )
            if scope.endswith("/se/squeeze") and se_ratio is None:
                # SeRatio is not recorded in the file (the engine reads SE
                # sizes from struct shapes, loader.cc); recover it here
                se_ratio = max(1, cfg.residual_channels // osz)

    if se_ratio is not None and se_ratio != cfg.se_ratio:
        cfg = NetConfig(**{**cfg.__dict__, "se_ratio": se_ratio})
    return cfg, {"params": params, "batch_stats": batch_stats}


def finalize_imported_variables(cfg: NetConfig, variables, boardsize=None):
    """Reconcile imported params with the net's actual pytree structure
    (adds gamma=1 where the architecture has use_gamma BNs)."""
    import jax
    import jax.numpy as jnp

    from sayuri_tpu.models.network import SayuriNet

    if boardsize is not None:
        cfg = NetConfig(**{**cfg.__dict__, "boardsize": boardsize})
    net = SayuriNet(cfg)
    n = cfg.boardsize
    dummy = jnp.zeros((1, n, n, cfg.input_channels))
    dummy = dummy.at[..., -1].set(1.0)
    ref = net.init(jax.random.PRNGKey(0), dummy, train=False)

    def merge(ref_tree, imp_tree):
        out = {}
        for k, v in ref_tree.items():
            if k in imp_tree:
                if isinstance(v, dict):
                    out[k] = merge(v, imp_tree[k])
                else:
                    out[k] = jnp.asarray(imp_tree[k]).reshape(v.shape)
            else:
                # gamma of merged BNs -> identity
                out[k] = jnp.ones_like(v) if k == "gamma" else v
        return out

    merged = {
        "params": merge(ref["params"], variables["params"]),
        "batch_stats": merge(
            ref.get("batch_stats", {}), variables["batch_stats"]
        ),
    }
    return cfg, merged, net


def load_checkpoint_for_inference(path: str):
    """Load either a trainer .ckpt or a reference-format weight file for
    the GTP engine."""
    if path.endswith(".ckpt"):
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        from flax import serialization
        import jax.numpy as jnp

        cfg = NetConfig(**blob["net_cfg"])
        # deserialize params/batch_stats out of the saved TrainState
        state = serialization.msgpack_restore(blob["state"])
        variables = {
            "params": state["params"],
            "batch_stats": state["batch_stats"],
        }
        return cfg, variables
    cfg, variables = import_reference_weights(path)
    cfg, variables, _ = finalize_imported_variables(cfg, variables)
    return cfg, variables
