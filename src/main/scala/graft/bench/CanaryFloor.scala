package graft.bench

/** Cross-round canary-floor store (`tools/canary_floor.json`).
  *
  * The bench's calm-start gate and its adj-primary promotion both read
  * ABSOLUTE machine-speed references that must survive across rounds
  * (/tmp is wiped; the repo file is not). Two key families share the
  * file, one floor per thread count each:
  *
  *  - `floor_sec_<cpus>`     — the GATE regime: min-of-3 canary samples
  *    observed on the run's early, cold-ish JVM (pre-headline only).
  *    The calm-start gate refuses to call a plateau "calm" unless the
  *    current best sits within its slack of this floor.
  *  - `hot_floor_sec_<cpus>` — the HOT regime: mid/after canary samples
  *    from a fully JIT-hot JVM, which read structurally lower than
  *    anything the gate's JVM can observe (measured 0.039 s deep-run vs
  *    0.078 s at gate time on the same idle machine). The adj-primary
  *    promotion compares the run's hot-sample median against THIS
  *    floor, so a promotion needs absolute evidence of load, not just
  *    one anomalously fast sample inside the run.
  *
  * The file is load-bearing for the calm gate, so its update rules are
  * contract, pinned by CanaryFloorSpec:
  *  - a floor only ever DECREASES (the machine's unloaded speed is a
  *    minimum; learning upward would let one loaded round raise the bar
  *    and vacuously pass every later gate);
  *  - one round may lower a floor by at most [[MaxDropPerRound]] (20%):
  *    a freak scheduling fluke must not lock future gates onto an
  *    unreachable bar — a real speed-up converges over rounds;
  *  - a non-positive, non-finite or malformed value reads as ABSENT
  *    (a hand-edited `0.0` would otherwise make the gate vacuous and
  *    the promotion check permanently loaded);
  *  - updating one key preserves every other key (per-cpu floors and
  *    the two regime families coexist in the same file).
  */
object CanaryFloor {

  /** One anomalously fast run may lower a floor by at most this factor. */
  val MaxDropPerRound = 0.8

  private val keyRe = """"([a-z_]+_sec_\d+)"\s*:\s*(-?[0-9.eE+-]+)""".r

  /** Every well-formed key in the file text, in file order. Values are
    * NOT validated here — [[read]] applies the positive-finite rule. */
  def keys(txt: String): Seq[String] =
    keyRe.findAllMatchIn(txt).map(_.group(1)).toSeq.distinct

  /** The floor stored under `key`, if present AND usable: a value that
    * is non-positive, non-finite, or unparseable is rejected as absent
    * rather than handed to the gate (a `0.0` floor would make the
    * calm check permanently unreachable; a negative one, vacuous). */
  def read(txt: String, key: String): Option[Double] =
    keyRe.findAllMatchIn(txt)
      .find(_.group(1) == key)
      .flatMap(m => m.group(2).toDoubleOption)
      .filter(f => f > 0 && f.isFinite)

  /** The value the file should hold after observing `observed` this
    * round: only-downward, drop bounded to [[MaxDropPerRound]] of the
    * prior. None when nothing should change (no prior improvement, or
    * an unusable observation). */
  def nextValue(prior: Option[Double], observed: Double): Option[Double] = {
    if (!(observed > 0) || !observed.isFinite) return None
    prior match {
      case Some(p) =>
        val bounded = math.max(observed, p * MaxDropPerRound)
        if (bounded < p) Some(bounded) else None
      case None => Some(observed)
    }
  }

  /** New file text with `key` updated per [[nextValue]] and every other
    * key preserved (re-rendered at 4 decimals). None when the update is
    * a no-op — callers then skip the write entirely, so a loaded round
    * never touches the file. */
  def updated(txt: String, key: String, observed: Double): Option[String] =
    nextValue(read(txt, key), observed).map { v =>
      val all = (keys(txt) :+ key).distinct.sorted
      all.map { k =>
        val kv = if (k == key) Some(v) else read(txt, k)
        // a key present but unusable (e.g. hand-edited to 0) is dropped
        // rather than re-serialized: rewriting garbage would launder it
        // into a parseable-but-wrong floor
        kv.map(x => f""""$k":$x%.4f""")
      }.flatten.mkString("{", ",", "}") + "\n"
    }
}
