"""Datamodule over an existing subsets directory — the consumer side of
predictions-as-dataset chaining (reference reuses the original datamodule
class with ``--subsets_dir``, ``base_datamodule.py:122-128``; here a dedicated
loader keeps any HDF5 subsets tree trainable regardless of which datamodule
produced it)."""

from .hdf5_datamodule import Hdf5DataModule


class SubsetsDataModule(Hdf5DataModule):
    """Loads ``{subsets_dir}/{train,val,test}.hdf5`` as-is."""

    def __init__(self, subsets_dir: str, **kwargs):
        assert subsets_dir, "SubsetsDataModule requires subsets_dir"
        super().__init__(subsets_dir=subsets_dir, **kwargs)

    def prepare_data(self) -> None:
        import os
        if os.path.exists(os.path.join(self._subsets_dir, "dparams.yaml")):
            self._load_set_info()
