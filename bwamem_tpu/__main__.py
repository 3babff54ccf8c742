"""`python -m bwamem_tpu` entry point (equivalent of the reference's
bwa-gasal2 binary, reference: src/main.c)."""
import sys

from .cli import main

sys.exit(main())
