from .pipeline_krea2 import Krea2Pipeline
