"""Datamodule registry (reference ``data/__init__.py:6-29`` discovers
``register.py`` modules; here registration is explicit imports)."""
from typing import Dict, Type

DATA_MODULES: Dict[str, type] = {}


def register_datamodule(name: str, cls: type) -> None:
    DATA_MODULES[name] = cls


def discover() -> Dict[str, type]:
    """Import all datamodule packages so they self-register."""
    from .carla.carla_2d3d import Carla2D3DDataModule
    register_datamodule("Carla2D3D", Carla2D3DDataModule)
    try:
        from .carla.carla_recorded import (CarlaRecordedDataModule,
                                           CarlaBenchmarkDataModule,
                                           CarlaRecordedVideoDataModule)
        register_datamodule("CarlaRecorded", CarlaRecordedDataModule)
        register_datamodule("CarlaBenchmark", CarlaBenchmarkDataModule)
        register_datamodule("CarlaRecordedVideo",
                            CarlaRecordedVideoDataModule)
    except ImportError:
        pass
    try:
        from .openpose.datamodules import (JAADOpenPoseDataModule,
                                           PIEOpenPoseDataModule,
                                           JAADBenchmarkDataModule,
                                           PIEBenchmarkDataModule)
        register_datamodule("JAADOpenPose", JAADOpenPoseDataModule)
        register_datamodule("PIEOpenPose", PIEOpenPoseDataModule)
        register_datamodule("JAADBenchmark", JAADBenchmarkDataModule)
        register_datamodule("PIEBenchmark", PIEBenchmarkDataModule)
    except ImportError:
        pass
    try:
        from .unipose.jaad_unipose import JAADUniPoseDataModule
        register_datamodule("JAADUniPose", JAADUniPoseDataModule)
    except ImportError:
        pass
    try:
        from .smpl.amass import AMASSDataModule
        register_datamodule("AMASS", AMASSDataModule)
    except ImportError:
        pass
    try:
        from .mpii.mpii import MPIIDataModule
        register_datamodule("MPII", MPIIDataModule)
    except ImportError:
        pass
    try:
        from .mixed.mixed import (JAADCarlaRecDataModule,
                                  JAADCarlaRecAMASSDataModule,
                                  CarlaRecAMASSDataModule,
                                  JAADCarlaRecBenchmarkDataModule)
        register_datamodule("JAADCarlaRec", JAADCarlaRecDataModule)
        register_datamodule("JAADCarlaRecAMASS", JAADCarlaRecAMASSDataModule)
        register_datamodule("CarlaRecAMASS", CarlaRecAMASSDataModule)
        register_datamodule("JAADCarlaRecBenchmark",
                            JAADCarlaRecBenchmarkDataModule)
    except ImportError:
        pass
    return dict(DATA_MODULES)
