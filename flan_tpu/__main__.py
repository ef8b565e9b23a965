from flan_tpu.cli import main
import sys

sys.exit(main())
