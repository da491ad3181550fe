import sys

from sphereflake_tpu.cli import main

sys.exit(main())
