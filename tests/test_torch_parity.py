"""Full-network numerical parity vs torch clones.

These tests re-express the reference architectures (MuRaL/model/
model_snv.py Network2, model_indel.py UNet_Small) in torch with a module
tree mirroring our Flax naming, copy the Flax-initialised weights across,
and require eval-mode outputs to agree to ~1e-4.  This validates every
wiring detail: center crop, pooling paddings, residual crops, softmax
averaging, U-Net skip order, softplus heads, strand-symmetric stem.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mural_tpu.models.indel import UNetSmall
from mural_tpu.models.snv import SNVNet2

torch = pytest.importorskip("torch")
tnn = torch.nn
F = torch.nn.functional


# --------------------------------------------------------------------------
# weight transfer: flax tree -> torch clone with identical module paths
# --------------------------------------------------------------------------

def _leaf_to_torch(name, arr):
    arr = np.asarray(arr)
    if name == "kernel" and arr.ndim == 3:     # conv (k, in, out)->(out,in,k)
        return "weight", torch.from_numpy(arr.transpose(2, 1, 0).copy())
    if name == "kernel" and arr.ndim == 2:     # dense (in,out)->(out,in)
        return "weight", torch.from_numpy(arr.T.copy())
    if name == "embedding":
        return "weight", torch.from_numpy(arr.copy())
    if name == "scale":
        return "weight", torch.from_numpy(arr.copy())
    if name == "mean":
        return "running_mean", torch.from_numpy(arr.copy())
    if name == "var":
        return "running_var", torch.from_numpy(arr.copy())
    return name, torch.from_numpy(arr.copy())


def copy_flax_to_torch(variables, tmodel):
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(
            variables.get(coll, {}))[0]
        for path, leaf in flat:
            keys = [p.key for p in path]
            obj = tmodel
            for k in keys[:-1]:
                obj = getattr(obj, k)
            tname, tval = _leaf_to_torch(keys[-1], leaf)
            param = getattr(obj, tname)
            assert param.shape == tval.shape, (keys, param.shape, tval.shape)
            with torch.no_grad():
                param.copy_(tval)


class _NS(tnn.Module):
    """Plain namespace module so attribute paths match flax names."""
    pass


def _bn(c):
    return tnn.BatchNorm1d(c)


def _conv(cin, cout, k, stride=1, bias=True):
    return tnn.Conv1d(cin, cout, k, stride, (k - 1) // 2, bias=bias)


# --------------------------------------------------------------------------
# torch Network2 clone
# --------------------------------------------------------------------------

class TResBlock(tnn.Module):
    def __init__(self, c, k=3):
        super().__init__()
        self.bn1, self.conv1 = _bn(c), _conv(c, c, k)
        self.bn2, self.conv2 = _bn(c), _conv(c, c, k)

    def forward(self, x):
        out = self.conv1(self.bn1(F.relu(x)))
        out = self.conv2(self.bn2(F.relu(out)))
        return x[:, :, :out.shape[2]] + out


class TTower(tnn.Module):
    def __init__(self, cin, cout, k, pools):
        super().__init__()
        self.conv1 = _NS(); self.conv1.bn = _bn(cin); self.conv1.conv = _conv(cin, cout, k)
        self.conv2 = _NS(); self.conv2.bn = _bn(cout); self.conv2.conv = _conv(cout, cout, k)
        self.conv3 = _NS(); self.conv3.bn = _bn(cout); self.conv3.conv = _conv(cout, cout, k)
        self.RBs1_0, self.RBs1_1 = TResBlock(cout), TResBlock(cout)
        self.RBs2_0, self.RBs2_1 = TResBlock(cout), TResBlock(cout)
        self.pools = pools

    def forward(self, x):
        p = self.pools
        x = self.conv1.conv(self.conv1.bn(x))
        x = F.max_pool1d(x, p[0][0], p[0][1], p[0][2])
        jump = x
        x = self.RBs1_1(self.RBs1_0(x))
        x = jump[:, :, :x.shape[2]] + x
        x = F.max_pool1d(x, p[1][0], p[1][1], p[1][2])
        x = self.conv2.conv(self.conv2.bn(x))
        jump = x
        x = self.RBs2_1(self.RBs2_0(x))
        x = jump[:, :, :x.shape[2]] + x
        x = F.max_pool1d(x, p[2][0], p[2][1], p[2][2])
        x = F.relu(self.conv3.conv(self.conv3.bn(x)))
        return torch.max(x, dim=2).values


class TorchSNVNet2(tnn.Module):
    def __init__(self, vocab, n_cat, sizes, cin, cout, k, n_class):
        super().__init__()
        self.local = _NS()
        self.local.emb_layer = tnn.Embedding(vocab, 5)
        dims = [n_cat * 5] + list(sizes)
        for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
            setattr(self.local, f"lin_{i}", tnn.Linear(a, b))
            setattr(self.local, f"bn_{i}", _bn(b))
        self.local_fc = tnn.Linear(sizes[-1], n_class)
        self.towers = _NS()
        self.towers.tower1 = TTower(cin, cout, k,
                                    [(3, 3, 1)] * 3)
        self.towers.tower2 = TTower(cin, cout, k,
                                    [(15, 15, 7), (7, 7, 3), (3, 3, 1)])
        for nm in ("distal_fc1", "distal_fc2"):
            ns = _NS(); ns.bn = _bn(cout); ns.fc = tnn.Linear(cout, n_class)
            setattr(self.towers, nm, ns)
        self.cin = cin
        self.n_cat = n_cat

    def forward(self, cat_x, distal):
        local = self.local.emb_layer(cat_x).reshape(cat_x.shape[0], -1)
        i = 0
        while hasattr(self.local, f"lin_{i}"):
            local = F.relu(getattr(self.local, f"lin_{i}")(local))
            local = getattr(self.local, f"bn_{i}")(local)
            i += 1
        local = self.local_fc(local)
        L = distal.shape[2]
        x = distal[:, :self.cin, :]
        crop = x[:, :, L // 2 - 100: L // 2 + 100 + 1]
        d1 = self.towers.tower1(crop)
        d1 = self.towers.distal_fc1.fc(self.towers.distal_fc1.bn(d1))
        d2 = self.towers.tower2(x)
        d2 = self.towers.distal_fc2.fc(self.towers.distal_fc2.bn(d2))
        distal_p = (F.softmax(d1, 1) + F.softmax(d2, 1)) / 2
        local_p = F.softmax(local, 1)
        return torch.log(torch.clamp((local_p + distal_p) / 2, min=1e-9))


def test_snvnet2_full_parity_with_torch():
    rng = np.random.default_rng(10)
    B, K, Lw, C = 6, 13, 401, 32
    cat = rng.integers(0, 65, size=(B, K))
    distal = rng.normal(size=(B, Lw, 4)).astype(np.float32)

    model = SNVNet2(emb_vocab=65, n_cat=K, lin_layer_sizes=[150, 80],
                    emb_dropout=0.0, lin_layer_dropouts=[0.0, 0.0],
                    in_channels=4, out_channels=C, kernel_size=3,
                    distal_fc_dropout=0.0, n_class=4)
    variables = model.init(jax.random.key(0), jnp.asarray(cat), None,
                           jnp.asarray(distal), False)
    ours = np.asarray(model.apply(variables, jnp.asarray(cat), None,
                                  jnp.asarray(distal), False))

    tmodel = TorchSNVNet2(65, K, [150, 80], 4, C, 3, 4)
    copy_flax_to_torch(variables, tmodel)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(cat),
                     torch.from_numpy(distal.transpose(0, 2, 1))).numpy()
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()


# --------------------------------------------------------------------------
# torch UNet clone
# --------------------------------------------------------------------------

class TConvBlock(tnn.Module):
    def __init__(self, c, expand=2):
        super().__init__()
        h = round(c * expand)
        self.conv_expand = tnn.Conv1d(c, h, 5, 1, 2, bias=False)
        self.bn1 = _bn(h)
        self.conv_project = tnn.Conv1d(h, c, 1, 1, 0, bias=False)
        self.bn2 = _bn(c)

    def forward(self, x):
        h = F.silu(self.bn1(self.conv_expand(x)))
        return x + self.bn2(self.conv_project(h))


class TorchUNet(tnn.Module):
    def __init__(self, n_class, oc, k, down, use_reverse):
        super().__init__()
        self.use_reverse = use_reverse
        self.down = down
        ch = [oc * (i + 1) for i in range(6)]
        self.ch = ch
        if use_reverse:
            self.stem_conv = _conv(4, 4, k)
            self.stem_bn = _bn(4)
        prev = 4
        for i in range(6):
            setattr(self, f"uplblock_{i}", _conv(prev, ch[i], k, down[i]))
            setattr(self, f"uplbn_{i}", _bn(ch[i]))
            setattr(self, f"upblock_{i}", TConvBlock(ch[i]))
            prev = ch[i]
        for j in range(5):
            lv = 4 - j
            setattr(self, f"downlblock_{j}", _conv(ch[lv + 1], ch[lv], k))
            setattr(self, f"downlbn_{j}", _bn(ch[lv]))
            setattr(self, f"downblock_{j}", TConvBlock(ch[lv]))
        self.out_conv1 = tnn.Conv1d(ch[0], ch[0], 1)
        self.out_bn = _bn(ch[0])
        self.out_conv2 = tnn.Conv1d(ch[0], ch[0], 1)
        self.out_fc_bn = _bn(ch[0])
        self.out_fc = tnn.Linear(ch[0], n_class)

    def forward(self, x):
        if self.use_reverse:
            f = self.stem_bn(self.stem_conv(x))
            r = self.stem_bn(self.stem_conv(x.flip([1, 2]))).flip([2])
            x = f + r
        encs = []
        for i in range(6):
            x = getattr(self, f"uplbn_{i}")(getattr(self, f"uplblock_{i}")(x))
            x = getattr(self, f"upblock_{i}")(x)
            encs.append(x)
        for j in range(5):
            lv = 4 - j
            x = F.interpolate(x, scale_factor=self.down[lv + 1],
                              mode="nearest")
            x = getattr(self, f"downlbn_{j}")(
                getattr(self, f"downlblock_{j}")(x))
            x = getattr(self, f"downblock_{j}")(x)
            x = encs[lv] + x
        x = F.relu(self.out_bn(self.out_conv1(x)))
        x = F.softplus(self.out_conv2(x))
        x = torch.max(x, dim=2).values
        x = self.out_fc(self.out_fc_bn(x))
        return F.softplus(x)


@pytest.mark.parametrize("use_reverse", [False, True])
def test_unet_full_parity_with_torch(use_reverse):
    rng = np.random.default_rng(11)
    B, Lw = 4, 2000
    down = (1, 4, 5, 5, 5, 2)
    distal = rng.normal(size=(B, Lw, 4)).astype(np.float32)

    model = UNetSmall(n_class=8, out_channels=8, kernel_size=7,
                      downsize=down, use_reverse=use_reverse)
    variables = model.init(jax.random.key(1), None, None,
                           jnp.asarray(distal), False)
    ours = np.asarray(model.apply(variables, None, None,
                                  jnp.asarray(distal), False))

    tmodel = TorchUNet(8, 8, 7, down, use_reverse)
    copy_flax_to_torch(variables, tmodel)
    tmodel.eval()
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(distal.transpose(0, 2, 1))).numpy()
    assert np.allclose(ours, ref, atol=2e-4), np.abs(ours - ref).max()
