"""``python -m multimodal_supernovae_tpu <command> ...`` — see cli/."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
