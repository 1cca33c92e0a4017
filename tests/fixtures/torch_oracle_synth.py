"""Deterministic weight synthesis shared by the torch-oracle fixture
generator (scripts/gen_torch_oracle_fixtures.py, runs against
/root/reference with torch) and the parity test
(tests/test_torch_oracle.py, torch-free).

Storing the reference U-Net state_dicts verbatim would be ~150 MB of
incompressible noise; instead both sides regenerate identical weights from
the state_dict's {key: shape} manifest with this pure-numpy function, and
the fixture stores only the manifest + inputs + the torch forward outputs.
"""

import numpy as np


def synth_state_dict(shapes, seed):
    """{torch state_dict key: shape} + seed -> {key: np.ndarray}.

    Key-order independent (keys are sorted; each array gets its own
    fold-in), BatchNorm running stats kept in a sane range so eval-mode
    outputs stay well-scaled.
    """
    out = {}
    for i, k in enumerate(sorted(shapes)):
        shp = tuple(int(s) for s in shapes[k])
        rng = np.random.default_rng([seed, i])
        if k.endswith("num_batches_tracked"):
            out[k] = np.asarray(0, np.int64)
        elif k.endswith("running_var"):
            out[k] = (0.5 + rng.uniform(0.0, 1.0, shp)).astype(np.float32)
        elif k.endswith("running_mean"):
            out[k] = (0.1 * rng.standard_normal(shp)).astype(np.float32)
        elif k.endswith("bias"):
            out[k] = (0.1 * rng.standard_normal(shp)).astype(np.float32)
        elif len(shp) == 1:  # BatchNorm affine weight
            out[k] = (1.0 + 0.1 * rng.standard_normal(shp)).astype(np.float32)
        else:  # conv / convT / linear / GRU weights
            fan = int(np.prod(shp)) // shp[0] if len(shp) > 1 else shp[0]
            std = 1.0 / np.sqrt(max(fan, 1))
            out[k] = (std * rng.standard_normal(shp)).astype(np.float32)
    return out
