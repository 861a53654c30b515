package graft.tools
import graft.model.InstanceModel
object InstanceDrive {
  def main(args: Array[String]): Unit = {
    val inst = InstanceModel.loadInstance("target/tmp/inst")
    println("STORES=" + inst.trendStores.map(_.parts.head.name).mkString(","))
    println("TRIGGERS=" + inst.triggers.map(_.name).mkString(","))
    println("MATS=" + inst.materializations.length)
    val empty = InstanceModel.loadInstance("target/tmp/no_such_instance")
    println("EMPTY=" + (empty.trendStores.isEmpty && empty.triggers.isEmpty))
  }
}
