from .config import Config, ConfigDict
from .families import build_family, family_axes, list_families
