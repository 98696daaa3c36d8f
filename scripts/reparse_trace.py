import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.profile_step import parse_xplane
parse_xplane(sys.argv[1] if len(sys.argv) > 1 else "/tmp/kdt_trace",
             top=int(sys.argv[2]) if len(sys.argv) > 2 else 40)
