"""Harness for importing the READ-ONLY reference PyTorch models in parity
tests. The reference targets older scipy/librosa APIs; we shim just enough to
import the modules under test. Reference code is used as a *test oracle* only
— it is never part of the framework."""

import sys
import types

_REF = "/root/reference"


def _shim_scipy():
    import scipy.signal
    import scipy.signal.windows

    if not hasattr(scipy.signal, "kaiser"):
        scipy.signal.kaiser = scipy.signal.windows.kaiser


def _shim_librosa():
    """Minimal fake so modules that import librosa at top level load; parity
    tests never call through it."""
    if "librosa" in sys.modules:
        return
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    fake = _mod("librosa")
    fake.filters = _mod("librosa.filters")
    fake.core = _mod("librosa.core")
    fake.util = _mod("librosa.util")
    sys.modules["librosa"] = fake
    sys.modules["librosa.filters"] = fake.filters
    sys.modules["librosa.core"] = fake.core
    sys.modules["librosa.util"] = fake.util


def _shim_omegaconf():
    if "omegaconf" in sys.modules:
        return
    fake = types.ModuleType("omegaconf")

    class _NS(dict):
        __getattr__ = dict.__getitem__

    class OmegaConf:
        @staticmethod
        def create(d):
            return _NS(d)

        @staticmethod
        def load(p):
            import yaml

            with open(p) as f:
                return _NS(yaml.safe_load(f))

    fake.OmegaConf = OmegaConf

    listcfg = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    listcfg.ListConfig = ListConfig
    fake.listconfig = listcfg
    fake.ListConfig = ListConfig
    fake.__path__ = []  # mark as package
    sys.modules["omegaconf"] = fake
    sys.modules["omegaconf.listconfig"] = listcfg


def _shim_pycwt():
    if "pycwt" in sys.modules:
        return
    fake = types.ModuleType("pycwt")
    fake.wavelet = types.ModuleType("pycwt.wavelet")
    sys.modules["pycwt"] = fake
    sys.modules["pycwt.wavelet"] = fake.wavelet


def _shim_lightning():
    if "pytorch_lightning" in sys.modules:
        return
    import torch

    fake = types.ModuleType("pytorch_lightning")
    fake.LightningModule = torch.nn.Module
    fake.seed_everything = lambda *a, **k: None
    sys.modules["pytorch_lightning"] = fake


def add_neuralseq_path():
    _shim_scipy()
    _shim_librosa()
    _shim_pycwt()
    p = f"{_REF}/NeuralSeq"
    if p not in sys.path:
        sys.path.insert(0, p)


def add_mka_path():
    _shim_scipy()
    _shim_librosa()
    _shim_omegaconf()
    _shim_lightning()
    p = f"{_REF}/text_to_audio/Make_An_Audio"
    if p not in sys.path:
        sys.path.insert(0, p)


def state_dict_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def add_sound_extraction_path():
    p = f"{_REF}/sound_extraction"
    if p not in sys.path:
        sys.path.insert(0, p)


def _shim_torchlibrosa():
    """Fake torchlibrosa so TSD models.py imports; CDur paths don't call it."""
    if "torchlibrosa" in sys.modules:
        return
    import importlib.machinery

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    import torch

    class _FakeModule(torch.nn.Module):
        """Instantiable no-op: HTSAT assigns these as submodules in
        ``__init__`` (its forward_features path never calls them)."""

        def __init__(self, *args, **kwargs):
            super().__init__()

        def forward(self, *args, **kwargs):  # pragma: no cover
            raise NotImplementedError("torchlibrosa shim called")

    fake = _mod("torchlibrosa")
    fake.augmentation = _mod("torchlibrosa.augmentation")
    fake.stft = _mod("torchlibrosa.stft")
    fake.augmentation.SpecAugmentation = _FakeModule
    fake.stft.Spectrogram = _FakeModule
    fake.stft.LogmelFilterBank = _FakeModule
    sys.modules["torchlibrosa"] = fake
    sys.modules["torchlibrosa.augmentation"] = fake.augmentation
    sys.modules["torchlibrosa.stft"] = fake.stft


def add_tsd_path():
    _shim_torchlibrosa()
    p = f"{_REF}/audio_detection"
    if p not in sys.path:
        sys.path.insert(0, p)


def _shim_torchvision():
    """utils.py (open_clap) imports torchvision.ops.misc.FrozenBatchNorm2d;
    the HTSAT paths under test never touch it."""
    if "torchvision" in sys.modules:
        return
    import importlib.machinery

    import torch

    def _mod(name):
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        return m

    tv = _mod("torchvision")
    tv.ops = _mod("torchvision.ops")
    tv.ops.misc = _mod("torchvision.ops.misc")
    tv.ops.misc.FrozenBatchNorm2d = torch.nn.Identity
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = tv.ops
    sys.modules["torchvision.ops.misc"] = tv.ops.misc


def _shim_misc(names=("h5py", "tqdm")):
    import importlib.machinery
    import importlib.util

    for n in names:
        if n in sys.modules or importlib.util.find_spec(n) is not None:
            continue
        m = types.ModuleType(n)
        m.__spec__ = importlib.machinery.ModuleSpec(n, None)
        if n == "tqdm":
            m.tqdm = lambda x, *a, **k: x
        sys.modules[n] = m


def load_open_clap_htsat():
    """Import the reference ``open_clap/htsat.py`` WITHOUT running the heavy
    ``open_clap/__init__`` (transformers/torchvision/h5py chain): register a
    synthetic package whose __path__ is the open_clap dir, so htsat's
    relative imports (.utils, .feature_fusion) resolve directly."""
    _shim_torchlibrosa()
    _shim_torchvision()
    _shim_misc()
    import importlib

    name = "ref_open_clap"
    if name not in sys.modules:
        pkg = types.ModuleType(name)
        pkg.__path__ = [f"{_REF}/text_to_audio/Make_An_Audio/ldm/modules/"
                        "encoders/open_clap"]
        import importlib.machinery

        pkg.__spec__ = importlib.machinery.ModuleSpec(
            name, None, is_package=True)
        pkg.__spec__.submodule_search_locations = pkg.__path__
        sys.modules[name] = pkg
    return importlib.import_module(f"{name}.htsat")


def load_data_gen_utils():
    """Import the reference ``data_gen/tts/data_gen_utils.py`` (the TextGrid
    → mel2ph oracle). Shims parselmouth/webrtcvad/pyloudnorm/skimage (unused
    by get_mel2ph) and restores numpy's removed ``np.float``/``np.int``
    aliases the old code uses."""
    import numpy as np

    add_neuralseq_path()
    _shim_misc(("parselmouth", "webrtcvad", "pyloudnorm"))
    if "skimage" not in sys.modules:
        import importlib.machinery

        sk = types.ModuleType("skimage")
        sk.__spec__ = importlib.machinery.ModuleSpec("skimage", None)
        tr = types.ModuleType("skimage.transform")
        tr.__spec__ = importlib.machinery.ModuleSpec("skimage.transform", None)
        tr.resize = lambda *a, **k: None
        sk.transform = tr
        sys.modules["skimage"] = sk
        sys.modules["skimage.transform"] = tr
    if not hasattr(np, "float"):
        np.float = float  # removed in numpy>=1.24; old code still uses it
    if not hasattr(np, "int"):
        np.int = int
    import importlib

    return importlib.import_module("data_gen.tts.data_gen_utils")
