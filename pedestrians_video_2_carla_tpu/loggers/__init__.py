"""Qualitative video logging (reference ``loggers/pedestrian/``)."""
from .pedestrian_logger import PedestrianLogger
from .pedestrian_writer import PedestrianWriter
