from .extractor import Extractor
