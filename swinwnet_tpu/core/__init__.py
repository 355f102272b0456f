from .config import ModelConfig, TrainConfig, GEOMETRY, DetectorGeometry

__all__ = ["ModelConfig", "TrainConfig", "GEOMETRY", "DetectorGeometry"]
