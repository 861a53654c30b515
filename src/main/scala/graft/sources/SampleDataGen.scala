package graft.sources

/** Deterministic stand-in for the reference's sample-data generator modules
  * (examples/tiny_instance/sample-data/tiny-set/__init__.py — a jinja2
  * template rendered once per granularity interval with
  * `{{ timestamp }}` → the interval timestamp and `{{ name[i] }}` →
  * `random.uniform(0, 80)`). graft renders the same placeholders but
  * derives values from a hash of (name, index, timestamp), so generated
  * sample data is reproducible across runs and engines.
  */
object SampleDataGen {

  private val TsPat = "\\{\\{\\s*timestamp\\s*\\}\\}".r
  private val ValPat = "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\[\\s*(\\d+)\\s*\\]\\s*\\}\\}".r

  /** Render one interval: `{{ timestamp }}` → ISO-8601 UTC,
    * `{{ name[i] }}` → deterministic uniform double in [0, 80). */
  def render(template: String, tsSec: Long): String = {
    val iso = java.time.Instant.ofEpochSecond(tsSec).toString
    val withTs = TsPat.replaceAllIn(template, iso)
    ValPat.replaceAllIn(withTs, m => {
      val h = scala.util.hashing.MurmurHash3
        .stringHash(s"${m.group(1)}:${m.group(2)}:$tsSec")
      val v = (h & 0x7fffffff).toDouble / Int.MaxValue * 80.0
      f"$v%.3f"
    })
  }

  /** Render one file per interval timestamp into `outDir`; returns the
    * directory. Mirrors load_sample_data.py's `generate_and_load` loop
    * (end = truncate(now), one render per granularity step). */
  def generate(
      templatePath: String, outDir: String, timestamps: Seq[Long]): String = {
    val tpl = java.nio.file.Files.readString(java.nio.file.Paths.get(templatePath))
    val dir = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(dir)
    timestamps.foreach { ts =>
      java.nio.file.Files.writeString(dir.resolve(s"gen_$ts.csv"), render(tpl, ts))
    }
    outDir
  }
}
