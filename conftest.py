# repo-root conftest so `python -m pytest tests/` resolves the package
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))
