package graft.sources

/** Deterministic stand-in for the reference's sample-data generator modules
  * (examples/tiny_instance/sample-data/tiny-set/__init__.py — a jinja2
  * template rendered once per granularity interval with
  * `{{ timestamp }}` → the interval timestamp and `{{ name[i] }}` →
  * `random.uniform(0, 80)`). graft renders the same placeholders but
  * derives values from md5("name:index:tsSec") — the repo-wide
  * engine-exact hash convention — so generated sample data is
  * reproducible across runs AND replayable by a SQL oracle (q337 gates
  * the full generate → ingest → aggregate path against DuckDB's md5).
  * Value = (first 32 hash bits mod 80000) / 1000, i.e. uniform on the
  * 3-decimal grid of [0, 80) — the same range contract as the
  * reference's uniform(0, 80), printed with exactly three decimals so
  * the rendered byte stream is grid-exact in any parser. */
object SampleDataGen {

  private val TsPat = "\\{\\{\\s*timestamp\\s*\\}\\}".r
  private val ValPat = "\\{\\{\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\[\\s*(\\d+)\\s*\\]\\s*\\}\\}".r

  /** Render one interval: `{{ timestamp }}` → ISO-8601 UTC,
    * `{{ name[i] }}` → deterministic 3-decimal value in [0, 80). */
  def render(template: String, tsSec: Long): String = {
    val iso = java.time.Instant.ofEpochSecond(tsSec).toString
    val withTs = TsPat.replaceAllIn(template, iso)
    ValPat.replaceAllIn(withTs, m => {
      val key = s"${m.group(1)}:${m.group(2)}:$tsSec"
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString
      val milli = java.lang.Long.parseLong(hex, 16) % 80000L
      s"${milli / 1000}.${"%03d".format(milli % 1000)}"
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
