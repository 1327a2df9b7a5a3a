import faulthandler, sys
faulthandler.dump_traceback_later(90, repeat=True, file=sys.stderr)
import solve_ccsp
solve_ccsp.main(["--results_dir","results/qual_v1","--milestone","4","--tries","10"])
