package org.apache.seatunnel.api.table.type;

/**
 * Compatibility surface for DynamicCompile user snippets (Graft shim).
 *
 * The reference's DynamicCompile transform hands user Java source the
 * SeaTunnel public API (seatunnel-api/.../type/SeaTunnelDataType.java).
 * Graft ships this minimal original re-declaration of that public surface
 * so the same snippets compile under javax.tools; {@link #typeName()} is
 * Graft's bridge to a Spark DDL type spelling.
 */
public interface SeaTunnelDataType<T> {
    /** Spark DDL spelling of this type (Graft extension). */
    String typeName();
}
