import sys

from tst.cli import main

sys.exit(main())
