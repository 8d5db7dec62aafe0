import sys

from kiss_tpu.cli import main

sys.exit(main())
