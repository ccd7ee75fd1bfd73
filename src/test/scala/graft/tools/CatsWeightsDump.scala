package graft.tools

/** Regenerates the weight export consumed by tools/cats_golden.py (the
  * independent NumPy evaluation behind cats_q17_expected.json): dumps
  * every tensor of the bundled serial `.keras` archive as JSON
  * `{path: {shape: [...], data: [...]}}`. The NumPy side re-derives the
  * ARCHITECTURE from the archive's own config.json and reimplements all
  * math from scratch — only the raw numbers pass through here (HDF5
  * parsing in pure python is the one piece not worth duplicating).
  *
  * Run: sbt "Test/runMain graft.tools.CatsWeightsDump /tmp/cats_weights.json"
  */
object CatsWeightsDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/cats_weights.json")
    val kerasPath =
      s"${graft.models.RefModels.dir}/cats_models/cats_small_nometa_serial.keras"
    val zf = new java.util.zip.ZipFile(kerasPath)
    val bytes =
      try zf.getInputStream(zf.getEntry("model.weights.h5")).readAllBytes()
      finally zf.close()
    val tensors = graft.models.Hdf5Reader.read(bytes)
    val sb = new StringBuilder("{")
    var first = true
    tensors.toSeq.sortBy(_._1).foreach { case (path, t) =>
      if (!first) sb.append(",")
      first = false
      sb.append('"').append(path).append("\":{\"shape\":[")
        .append(t.shape.mkString(",")).append("],\"data\":[")
      var i = 0
      while (i < t.data.length) {
        if (i > 0) sb.append(',')
        sb.append(t.data(i))
        i += 1
      }
      sb.append("]}")
    }
    sb.append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes("UTF-8"))
    println(s"wrote ${tensors.size} tensors to $out")
  }
}
